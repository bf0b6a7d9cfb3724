"""Context-parallel causal attention: the time axis sharded over the mesh,
KV chunks riding an ICI ring (SURVEY.md §3 parallelism checklist, §6.7).

The context-scaling study (RESULTS.md runs 3-5) made context length the
framework's one proven representation lever, and the flash kernel
(`ops/attention_pallas.py`) already removes the O(T^2) score memory on a
single chip. The next wall is the sequence itself: at some T the (B, T, D)
activations of the transformer gar stop fitting one chip's HBM. This module
shards T across the mesh — every per-position op in the transformer
(LayerNorm, QKV/out projections, the MLP) is embarrassingly parallel over
T, so causal attention is the ONLY op that mixes positions and the only one
that needs communication:

  layout:   device d of R holds rows [d*T_loc, (d+1)*T_loc) of q/k/v
            (B, T_loc, H, Dh per shard; heads folded into the lead dim for
            compute, exactly like the flash kernel).
  forward:  lax.scan over R ring steps. Each device scores its local
            queries against the KV chunk it currently holds, applies the
            GLOBAL causal mask (row/col offsets from axis_index), folds the
            tile into online-softmax running stats (m, l, output
            accumulator — the flash trick at chunk granularity), then
            ppermutes the chunk to its ring neighbor. Per-device live state
            is one KV chunk + one (BH, T_loc, T_loc) score tile,
            independent of R.
  backward: custom_vjp saving only the lse (+ o for the dres row-sums). A
            second ring recomputes each score tile, forms
            dS = P*(dO V^T - rowsum(dO*O))*scale, accumulates dQ locally,
            and accumulates each chunk's dK/dV into buffers that travel
            WITH the chunk — after R rotations they arrive home holding
            every device's contribution (the `ops/infonce_ring.py` dz
            pattern applied to attention).

Device order on the ring is query order: chunks whose owner sits after the
local device are entirely above the causal diagonal and fold to nothing
(their tiles are masked to -inf; ~half the ring's tiles on average — the
price of the simple contiguous layout; a zig-zag layout would balance it
and is noted in docs/DESIGN.md as future work).

Semantics match single-device causal MHA over the concatenated sequence;
tested to equality (fwd and all grads) against the flash/XLA oracles on the
8-virtual-device CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cpc_tpu.ops.ring_util import ring_perm

_NEG = -1e30


def _mask(s, me, owner, T_loc):
    rows = me * T_loc + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    cols = owner * T_loc + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    return jnp.where(cols <= rows, s, _NEG)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_attn(q, k, v, scale, axis_name):
    """(BH, T_loc, Dh) local q/k/v shards -> (BH, T_loc, Dh) causal
    attention output over the GLOBAL ring-concatenated sequence."""
    o, _ = _ring_fwd(q, k, v, scale, axis_name)
    return o


def _ring_fwd(q, k, v, scale, axis_name):
    BH, T_loc, Dh = q.shape
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    q32 = q.astype(jnp.float32)

    def fold(stats, kc, vc, r):
        m, l, acc = stats
        owner = (me - r) % R
        s = jax.lax.dot_general(
            q32, kc.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (BH, Tl, Tl)
        s = _mask(s, me, owner, T_loc)
        tile_max = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, tile_max)
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jax.lax.dot_general(
            p, vc.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return (m_new, l, acc)

    def step(carry, r):
        m, l, acc, kc, vc = carry
        m, l, acc = fold((m, l, acc), kc, vc, r)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (m, l, acc, kc, vc), None

    # vma: the running stats become device-varying after the first fold
    # (the causal mask depends on axis_index), so the scan carry must start
    # marked varying — and not just over the ring axis: under a 2-D DP x CP
    # mesh q/k/v are ALSO data-varying. Deriving the initializers from q32
    # arithmetically inherits exactly the inputs' varying set either way.
    init = (q32[..., 0] * 0 + _NEG,
            q32[..., 0] * 0,
            q32 * 0) + (k, v)
    # r=0 scores the OWN chunk first (its diagonal seeds the running max for
    # every row); the last chunk is scored without the discarded rotation
    (m, l, acc, k_last, v_last), _ = jax.lax.scan(
        step, init, jnp.arange(R - 1, dtype=jnp.int32))
    m, l, acc = fold((m, l, acc), k_last, v_last,
                     jnp.asarray(R - 1, jnp.int32))
    o = (acc / l[..., None]).astype(q.dtype)
    lse = m + jnp.log(l)
    return o, (q, k, v, lse, o)


def _ring_fwd_rule(q, k, v, scale, axis_name):
    o, res = _ring_fwd(q, k, v, scale, axis_name)
    return o, res


def _ring_bwd_rule(scale, axis_name, res, g):
    q, k, v, lse, o = res
    BH, T_loc, Dh = q.shape
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    q32 = q.astype(jnp.float32)
    do = g.astype(jnp.float32)
    dres = jnp.sum(do * o.astype(jnp.float32), axis=-1)  # (BH, T_loc)

    def contribute(dq, kc, vc, dk, dv, r):
        owner = (me - r) % R
        kc32 = kc.astype(jnp.float32)
        vc32 = vc.astype(jnp.float32)
        s = jax.lax.dot_general(
            q32, kc32, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(_mask(s, me, owner, T_loc) - lse[..., None])
        dv = dv + jax.lax.dot_general(  # P^T dO  (BH, Tl_chunk, Dh)
            p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # dO V^T  (BH, Tl, Tl_chunk)
            do, vc32, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dres[..., None]) * scale
        dq = dq + jax.lax.dot_general(
            ds, kc32, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = dk + jax.lax.dot_general(  # dS^T Q  (BH, Tl_chunk, Dh)
            ds, q32, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return dq, dk, dv

    def step(carry, r):
        dq, kc, vc, dk, dv = carry
        dq, dk, dv = contribute(dq, kc, vc, dk, dv, r)
        # dk/dv travel WITH their chunk: after R rotations they are home
        # carrying every device's contribution
        kc, vc, dk, dv = (jax.lax.ppermute(x, axis_name, perm)
                          for x in (kc, vc, dk, dv))
        return (dq, kc, vc, dk, dv), None

    # q32 * 0 inherits the inputs' full varying set (ring axis + a DP axis
    # when running on a 2-D mesh) — see the forward-scan init note
    zero = q32 * 0
    init = (zero, k, v, zero, zero)
    (dq, k_last, v_last, dk, dv), _ = jax.lax.scan(
        step, init, jnp.arange(R - 1, dtype=jnp.int32))
    dq, dk, dv = contribute(dq, k_last, v_last, dk, dv,
                            jnp.asarray(R - 1, jnp.int32))
    # the chunks themselves no longer need to move — one last rotation
    # brings the gradient buffers home
    dk = jax.lax.ppermute(dk, axis_name, perm)
    dv = jax.lax.ppermute(dv, axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_attn.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_causal_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    axis_name: str,
                    scale: float | None = None) -> jnp.ndarray:
    """Causal MHA over a time-sharded sequence (call under shard_map).

    q/k/v: (B, T_loc, H, Dh) — this device's contiguous T shard, in ring
    (= query) order along the named mesh axis. Returns the matching
    (B, T_loc, H, Dh) output shard of exact causal attention over the
    global T = R * T_loc sequence. scale defaults to Dh**-0.5.
    """
    B, T_loc, H, Dh = q.shape
    if scale is None:
        scale = float(Dh) ** -0.5

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T_loc, Dh)

    o = _ring_attn(fold(q), fold(k), fold(v), scale, axis_name)
    return o.reshape(B, H, T_loc, Dh).transpose(0, 2, 1, 3)
