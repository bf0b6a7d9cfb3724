"""Load-balanced ("zig-zag") context-parallel causal attention.

The contiguous ring (`ops/attention_ring.py`) computes EVERY score tile and
masks the above-diagonal ones — SPMD can't skip per-device work, so the
(R-1)/2R of tiles that are entirely above the causal diagonal are pure
wasted MXU FLOPs (docs/DESIGN.md flagged the zig-zag layout as the known
fix). This module implements it:

  layout:    split the global T into 2R chunks of C = T/(2R); device d owns
             chunks (d, 2R-1-d) — one early + one late, so every device's
             TOTAL causal work is identical (the classic zig-zag balance).
  schedule:  the own pair is scored first (3 sub-tiles: two with the static
             in-chunk causal mask, one full). Then R-1 ring steps, each
             scoring exactly TWO full (C, C) sub-tiles, no masks:
               tile A: q_late x k_early(owner)  — late rows attend every
                       earlier chunk, for every owner;
               tile B: owner < me ? q_early x k_early : q_late x k_late —
                       the operands are SELECTED with jnp.where (data
                       movement, not control flow — SPMD-safe; `owner < me`
                       is device-varying, so lax.cond could not skip the
                       work, but an operand select can REPLACE it).
             Per-device score FLOPs: (2R+1) sub-tiles vs the contiguous
             ring's 4R — the causal-optimal half, exactly, with perfect
             balance. The online-softmax fold destination for tile B is
             also select-scattered (stats are (C,)/(C,Dh) — bandwidth
             noise next to the (C,C,Dh) matmuls it avoids).
  reshard:   the PUBLIC contract stays contiguous (device d's rows are
             [d*T_loc, (d+1)*T_loc)) — identical to ring_causal_mha, so the
             transformer's positional offsets, the halo encoder, and the
             InfoNCE ctx labels need no zig-zag awareness. Internally q/k/v
             hop to the zig-zag layout with two ppermutes each (arbitrary
             permutations are one ICI round) and the output hops back;
             jax differentiates straight through ppermute, so only the
             attention core needs the custom VJP (same saved-lse +
             traveling-dK/dV pattern as the contiguous ring).

Semantics match single-device causal MHA over the concatenated sequence;
tested to equality (fwd + all grads) against the contiguous ring and the
XLA oracle on the 8-virtual-device CPU mesh, 1-D and 2-D (DP x CP) meshes
(tests/test_ring_attention.py). Select with `ar.attn_impl='zigzag'`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cpc_tpu.ops.ring_util import ring_perm

_NEG = -1e30


def _zdev(c: int, R: int) -> int:
    """Zig-zag owner of global chunk c (of 2R): device min(c, 2R-1-c)."""
    return c if c < R else 2 * R - 1 - c


def _to_zigzag(x, axis_name):
    """(.., 2C, ..) contiguous local rows (global chunks 2d, 2d+1) ->
    zig-zag local rows (chunks d, 2R-1-d), time on axis 1."""
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    C = x.shape[1] // 2
    h0, h1 = x[:, :C], x[:, C:]
    # device s's half0 is chunk 2s, half1 is chunk 2s+1; both are one
    # point-to-point hop to their zig-zag owner
    r0 = jax.lax.ppermute(h0, axis_name,
                          [(s, _zdev(2 * s, R)) for s in range(R)])
    r1 = jax.lax.ppermute(h1, axis_name,
                          [(s, _zdev(2 * s + 1, R)) for s in range(R)])
    # r0 delivered the EVEN-index needed chunk, r1 the odd one; chunk d
    # (the early slot) is even iff d is even
    d_even = (me % 2) == 0
    e = jnp.where(d_even, r0, r1)
    lt = jnp.where(d_even, r1, r0)
    return jnp.concatenate([e, lt], axis=1)


def _from_zigzag(x, axis_name):
    """Inverse of _to_zigzag (time on axis 1)."""
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    C = x.shape[1] // 2
    e, lt = x[:, :C], x[:, C:]
    d_even = (me % 2) == 0
    # each device's EVEN chunk is e when d is even, else its late chunk
    even_chunk = jnp.where(d_even, e, lt)
    odd_chunk = jnp.where(d_even, lt, e)
    h0 = jax.lax.ppermute(  # even chunk 2s -> contiguous device s, half0
        even_chunk, axis_name,
        [(d, (d if d % 2 == 0 else 2 * R - 1 - d) // 2) for d in range(R)])
    h1 = jax.lax.ppermute(  # odd chunk 2s+1 -> contiguous device s, half1
        odd_chunk, axis_name,
        [(d, ((2 * R - 1 - d) if d % 2 == 0 else d) // 2)
         for d in range(R)])
    return jnp.concatenate([h0, h1], axis=1)


def _causal(s):
    """In-chunk causal mask (row i attends col j <= i) — static, the only
    mask the zig-zag schedule ever needs."""
    i = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    return jnp.where(j <= i, s, _NEG)


def _dot_qk(q, k, scale):
    return jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale


def _dot_pv(p, v):
    return jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _fold(stats, s, vc):
    m, l, acc = stats
    tile_max = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m, tile_max)
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1)
    acc = acc * corr[..., None] + _dot_pv(p, vc)
    return (m_new, l, acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _zz_attn(q, k, v, scale, axis_name):
    """(BH, 2C, Dh) ZIG-ZAG-layout local q/k/v -> same-layout output of
    exact causal attention over the global 2RC sequence."""
    o, _ = _zz_fwd(q, k, v, scale, axis_name)
    return o


def _split(x, C):
    return x[:, :C], x[:, C:]


def _zz_fwd(q, k, v, scale, axis_name):
    BH, T2, Dh = q.shape
    C = T2 // 2
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    q32 = q.astype(jnp.float32)
    q_e, q_l = _split(q32, C)
    k_e, k_l = _split(k, C)
    v_e, v_l = _split(v, C)

    # vma: derive initializers from q32 so they inherit the inputs' full
    # varying set (ring axis + a DP axis on 2-D meshes) — attention_ring.py
    def init():
        return (q_e[..., 0] * 0 + _NEG, q_e[..., 0] * 0, q_e * 0)

    # own pair: the only masked tiles in the whole schedule
    st_e = _fold(init(), _causal(_dot_qk(q_e, k_e.astype(jnp.float32),
                                         scale)), v_e)
    st_l = _fold(init(), _dot_qk(q_l, k_e.astype(jnp.float32), scale), v_e)
    st_l = _fold(st_l, _causal(_dot_qk(q_l, k_l.astype(jnp.float32),
                                       scale)), v_l)

    def step(carry, r):
        (m_e, l_e, a_e), (m_l, l_l, a_l), ke, kl, ve, vl = carry
        ke, kl, ve, vl = (jax.lax.ppermute(x, axis_name, perm)
                          for x in (ke, kl, ve, vl))
        owner = (me - r) % R
        is_lt = owner < me
        ke32, kl32 = ke.astype(jnp.float32), kl.astype(jnp.float32)
        ve32, vl32 = ve.astype(jnp.float32), vl.astype(jnp.float32)
        # tile A: late rows vs the owner's early chunk — always attended
        st_l = _fold((m_l, l_l, a_l), _dot_qk(q_l, ke32, scale), ve32)
        # tile B: operand-selected full tile; destination select-scattered
        qB = jnp.where(is_lt, q_e, q_l)
        kB = jnp.where(is_lt, ke32, kl32)
        vB = jnp.where(is_lt, ve32, vl32)
        dst = (jnp.where(is_lt, m_e, st_l[0]),
               jnp.where(is_lt, l_e, st_l[1]),
               jnp.where(is_lt, a_e, st_l[2]))
        dst = _fold(dst, _dot_qk(qB, kB, scale), vB)
        st_e = (jnp.where(is_lt, dst[0], m_e),
                jnp.where(is_lt, dst[1], l_e),
                jnp.where(is_lt, dst[2], a_e))
        st_l = (jnp.where(is_lt, st_l[0], dst[0]),
                jnp.where(is_lt, st_l[1], dst[1]),
                jnp.where(is_lt, st_l[2], dst[2]))
        return (st_e, st_l, ke, kl, ve, vl), None

    (st_e, st_l, *_), _ = jax.lax.scan(
        step, (st_e, st_l, k_e, k_l, v_e, v_l),
        jnp.arange(1, R, dtype=jnp.int32))
    m_e, l_e, a_e = st_e
    m_l, l_l, a_l = st_l
    o = jnp.concatenate([a_e / l_e[..., None], a_l / l_l[..., None]],
                        axis=1).astype(q.dtype)
    lse = jnp.concatenate([m_e + jnp.log(l_e), m_l + jnp.log(l_l)], axis=1)
    return o, (q, k, v, lse, o)


def _zz_fwd_rule(q, k, v, scale, axis_name):
    o, res = _zz_fwd(q, k, v, scale, axis_name)
    return o, res


def _zz_bwd_rule(scale, axis_name, res, g):
    q, k, v, lse, o = res
    BH, T2, Dh = q.shape
    C = T2 // 2
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    q32 = q.astype(jnp.float32)
    q_e, q_l = _split(q32, C)
    k_e, k_l = _split(k, C)
    v_e, v_l = _split(v, C)
    do = g.astype(jnp.float32)
    do_e, do_l = _split(do, C)
    lse_e, lse_l = _split(lse, C)
    o32 = o.astype(jnp.float32)
    dres = jnp.sum(do * o32, axis=-1)
    dres_e, dres_l = _split(dres, C)

    def tile_bwd(qc, kc, vc, doc, lsec, dresc, masked):
        """One sub-tile's (dq, dk, dv) contributions; kc/vc f32."""
        s = _dot_qk(qc, kc, scale)
        if masked:
            s = _causal(s)
        p = jnp.exp(s - lsec[..., None])
        dv = jax.lax.dot_general(  # P^T dO
            p, doc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # dO V^T
            doc, vc, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dresc[..., None]) * scale
        dq = _dot_pv(ds, kc)  # dS K
        dk = jax.lax.dot_general(  # dS^T Q
            ds, qc, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return dq, dk, dv

    k_e32, k_l32 = k_e.astype(jnp.float32), k_l.astype(jnp.float32)
    v_e32, v_l32 = v_e.astype(jnp.float32), v_l.astype(jnp.float32)

    # own pair (mirrors the forward's three static sub-tiles)
    dq_e, dk_e, dv_e = tile_bwd(q_e, k_e32, v_e32, do_e, lse_e, dres_e,
                                masked=True)
    dq1, dk1, dv1 = tile_bwd(q_l, k_e32, v_e32, do_l, lse_l, dres_l,
                             masked=False)
    dq_l = dq1
    dk_e = dk_e + dk1
    dv_e = dv_e + dv1
    dq2, dk_l, dv_l = tile_bwd(q_l, k_l32, v_l32, do_l, lse_l, dres_l,
                               masked=True)
    dq_l = dq_l + dq2

    def step(carry, r):
        dq_e, dq_l, ke, kl, ve, vl, dke, dkl, dve, dvl = carry
        # dk/dv travel WITH their chunks (infonce_ring's dz pattern)
        ke, kl, ve, vl, dke, dkl, dve, dvl = (
            jax.lax.ppermute(x, axis_name, perm)
            for x in (ke, kl, ve, vl, dke, dkl, dve, dvl))
        owner = (me - r) % R
        is_lt = owner < me
        ke32, kl32 = ke.astype(jnp.float32), kl.astype(jnp.float32)
        ve32, vl32 = ve.astype(jnp.float32), vl.astype(jnp.float32)
        # tile A
        dqA, dkA, dvA = tile_bwd(q_l, ke32, ve32, do_l, lse_l, dres_l,
                                 masked=False)
        dq_l = dq_l + dqA
        dke = dke + dkA
        dve = dve + dvA
        # tile B: operand/cotangent selects mirror the forward
        qB = jnp.where(is_lt, q_e, q_l)
        kB = jnp.where(is_lt, ke32, kl32)
        vB = jnp.where(is_lt, ve32, vl32)
        doB = jnp.where(is_lt, do_e, do_l)
        lseB = jnp.where(is_lt, lse_e, lse_l)
        dresB = jnp.where(is_lt, dres_e, dres_l)
        dqB, dkB, dvB = tile_bwd(qB, kB, vB, doB, lseB, dresB, masked=False)
        dq_e = dq_e + jnp.where(is_lt, dqB, 0.0)
        dq_l = dq_l + jnp.where(is_lt, 0.0, dqB)
        dke = dke + jnp.where(is_lt, dkB, 0.0)
        dkl = dkl + jnp.where(is_lt, 0.0, dkB)
        dve = dve + jnp.where(is_lt, dvB, 0.0)
        dvl = dvl + jnp.where(is_lt, 0.0, dvB)
        return (dq_e, dq_l, ke, kl, ve, vl, dke, dkl, dve, dvl), None

    init = (dq_e, dq_l, k_e, k_l, v_e, v_l, dk_e, dk_l, dv_e, dv_l)
    (dq_e, dq_l, _, _, _, _, dk_e, dk_l, dv_e, dv_l), _ = jax.lax.scan(
        step, init, jnp.arange(1, R, dtype=jnp.int32))
    # chunks sit one rotation short of home — one last hop for the buffers
    dk_e, dk_l, dv_e, dv_l = (jax.lax.ppermute(x, axis_name, perm)
                              for x in (dk_e, dk_l, dv_e, dv_l))
    dq = jnp.concatenate([dq_e, dq_l], axis=1).astype(q.dtype)
    dk = jnp.concatenate([dk_e, dk_l], axis=1).astype(k.dtype)
    dv = jnp.concatenate([dv_e, dv_l], axis=1).astype(v.dtype)
    return dq, dk, dv


_zz_attn.defvjp(_zz_fwd_rule, _zz_bwd_rule)


def zigzag_causal_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                      axis_name: str,
                      scale: float | None = None) -> jnp.ndarray:
    """Drop-in for ring_causal_mha with the balanced zig-zag schedule.

    q/k/v: (B, T_loc, H, Dh) — this device's CONTIGUOUS T shard (same
    contract as ring_causal_mha; the zig-zag relayout is internal, two
    ppermutes each way). T_loc must be even (global T divides 2R). Returns
    the matching contiguous output shard of exact causal attention over
    the global sequence. scale defaults to Dh**-0.5.
    """
    B, T_loc, H, Dh = q.shape
    if T_loc % 2:
        raise ValueError(
            f"zigzag attention needs an even per-device T (2 chunks/device;"
            f" got T_loc={T_loc}): make the global T divide 2*ring_size")
    if scale is None:
        scale = float(Dh) ** -0.5

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T_loc, Dh)

    qz, kz, vz = (_to_zigzag(fold(x), axis_name) for x in (q, k, v))
    o = _from_zigzag(_zz_attn(qz, kz, vz, scale, axis_name), axis_name)
    return o.reshape(B, H, T_loc, Dh).transpose(0, 2, 1, 3)
