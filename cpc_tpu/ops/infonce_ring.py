"""Ring-sharded all-steps InfoNCE over the data mesh axis (SURVEY.md §6.7
stretch goal; VERDICT r1 #8).

'all_steps' negatives with cross-replica sharing score every prediction
against the GLOBAL R_replicas * B_local * T candidate pool. The gathered
pool (and its score slab) grows linearly with the replica count; this
module never gathers it. Instead the candidate chunks ride an ICI ring:

  forward:  lax.scan over R ring steps. Each replica scores its local
            predictions against the chunk it currently holds, folds the
            tile into online-softmax running stats (max m, sum l, positive
            score, running argmax — the flash-attention trick applied
            around the ring), then ppermutes the chunk to its neighbor.
            Per-replica live state is one chunk + one (rows, B_local*T)
            score tile, independent of the replica count.
  backward: custom_vjp saving only the log-sum-exp. A second ring
            recomputes each score tile, forms delta = (softmax - onehot)*g,
            accumulates dp locally, and accumulates each chunk's dz into a
            buffer that travels WITH the chunk — after R rotations both
            arrive back at their owner with every replica's contribution.

Semantics match cpc_tpu.ops.infonce with negatives='all_steps' and
axis_name set (the all-gather formulation): positive column for local row
(t, k, i) is (axis_index*B + i)*T + (t+k+1) in the global pool; tested to
equality on the virtual 8-device CPU mesh (tests/test_ring_infonce.py).

The kernel itself (`_ring_nll`) is chunk-geometry-agnostic — it scores
local prediction rows against whatever chunk decomposition rides the ring,
given each row's GLOBAL positive column. Three geometries instantiate it:
`ring_infonce_allsteps` (DP: replicas own BATCH chunks),
`ring_infonce_allsteps_ctx` (context parallelism: devices own TIME chunks
of the same batch — the loss half of parallel/cp.py, where a row's
positive usually lives in a neighbor's chunk), and the latter's
`data_axis=` mode (2-D DP x CP: devices own (batch-chunk, time-chunk)
tiles and ONE ring over the flattened (data, ctx) axes sweeps the global
B_glob * T_glob pool).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cpc_tpu.ops.ring_util import pvary, ring_perm

_NEG = -1e30


def _labels(B: int, Tp: int, K: int, T: int, shift):
    """Global positive column per local row r = (t*K + k)*B + i."""
    r = jnp.arange(Tp * K * B)
    i = r % B
    tk = r // B
    k = tk % K
    t = tk // K
    return (shift + i) * T + (t + k + 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring_nll(p_flat, z_flat, labels, axis_name):
    """p_flat (rows, D) local predictions; z_flat (n_loc, D) local candidate
    chunk; labels (rows,) GLOBAL positive column per row (col = owner*n_loc
    + local index; -1 = no positive, the row is a masked filler). Returns
    (nll, correct) per local row against the GLOBAL ring pool."""
    (nll, cor), _ = _ring_fwd(p_flat, z_flat, labels, axis_name)
    return nll, cor


def _ring_fwd(p_flat, z_flat, labels, axis_name):
    rows, _ = p_flat.shape
    n_loc = z_flat.shape[0]
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    p32 = p_flat.astype(jnp.float32)

    def fold(carry, z, r):
        m, l, slab, av, ai = carry
        owner = (me - r) % R
        s = p32 @ z.astype(jnp.float32).T  # (rows, n_loc)
        cols = owner * n_loc + jnp.arange(n_loc)[None, :]
        slab = slab + jnp.sum(
            jnp.where(cols == labels[:, None], s, 0.0), axis=-1)
        tile_max = jnp.max(s, axis=-1)
        tile_arg = owner * n_loc + jnp.argmax(s, axis=-1).astype(jnp.int32)
        # tie-break toward the LOWER global column so accuracy matches the
        # all-gather path's first-index argmax regardless of visit order
        better = (tile_max > av) | ((tile_max == av) & (tile_arg < ai))
        av = jnp.where(better, tile_max, av)
        ai = jnp.where(better, tile_arg, ai)
        m_new = jnp.maximum(m, tile_max)
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[:, None]), axis=-1)
        return (m_new, l, slab, av, ai)

    def step(carry, r):
        *stats, z = carry
        stats = fold(tuple(stats), z, r)
        z = jax.lax.ppermute(z, axis_name, perm)
        return (*stats, z), None

    # pcast: the stats become device-varying at the first fold (owner/labels
    # depend on axis_index), so the scan carry must start marked varying
    init = tuple(pvary(x, axis_name) for x in (
        jnp.full((rows,), _NEG, jnp.float32),
        jnp.zeros((rows,), jnp.float32),
        jnp.zeros((rows,), jnp.float32),
        jnp.full((rows,), _NEG, jnp.float32),
        jnp.full((rows,), jnp.iinfo(jnp.int32).max, jnp.int32))) + (z_flat,)
    # R-1 score+rotate steps, then the final chunk scored WITHOUT the
    # (discarded) last rotation — one chunk of ICI traffic saved per eval
    (m, l, slab, av, ai, z_last), _ = jax.lax.scan(
        step, init, jnp.arange(R - 1, dtype=jnp.int32))
    m, l, slab, av, ai = fold((m, l, slab, av, ai), z_last,
                              jnp.asarray(R - 1, jnp.int32))
    lse = m + jnp.log(l)
    nll = lse - slab
    correct = (ai == labels).astype(jnp.float32)
    return (nll, correct), (p_flat, z_flat, labels, lse)


def _ring_bwd(axis_name, res, cots):
    p_flat, z_flat, labels, lse = res
    g_nll, _ = cots  # argmax accuracy is non-differentiable
    rows, D = p_flat.shape
    n_loc = z_flat.shape[0]
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = ring_perm(axis_name)
    g = g_nll.astype(jnp.float32)
    p32 = p_flat.astype(jnp.float32)

    def contribute(dp, z, dz, r):
        owner = (me - r) % R
        z32 = z.astype(jnp.float32)
        s = p32 @ z32.T
        cols = owner * n_loc + jnp.arange(n_loc)[None, :]
        soft = jnp.exp(s - lse[:, None])
        delta = (soft - (cols == labels[:, None]).astype(jnp.float32)) \
            * g[:, None]
        return dp + delta @ z32, dz + delta.T @ p32

    def step(carry, r):
        dp, z, dz = carry
        dp, dz = contribute(dp, z, dz, r)
        # dz travels with its chunk so that after R rotations it is home
        # with every replica's contribution accumulated.
        z = jax.lax.ppermute(z, axis_name, perm)
        dz = jax.lax.ppermute(dz, axis_name, perm)
        return (dp, z, dz), None

    init = (pvary(jnp.zeros((rows, D), jnp.float32), axis_name),
            z_flat,
            pvary(jnp.zeros((n_loc, D), jnp.float32), axis_name))
    (dp, z_last, dz), _ = jax.lax.scan(step, init,
                                       jnp.arange(R - 1, dtype=jnp.int32))
    # final chunk: accumulate, then one last dz rotation brings it home —
    # z itself no longer needs to move
    dp, dz = contribute(dp, z_last, dz, jnp.asarray(R - 1, jnp.int32))
    dz = jax.lax.ppermute(dz, axis_name, perm)
    return dp.astype(p_flat.dtype), dz.astype(z_flat.dtype), None  # labels int


_ring_nll.defvjp(_ring_fwd, _ring_bwd)


def ring_infonce_allsteps(
    preds_v: jnp.ndarray,  # (B, Tp, K, D) local predictions
    z: jnp.ndarray,        # (B, T, D) local latents (the local ring chunk)
    *,
    axis_name: str,
) -> Tuple[jnp.ndarray, dict]:
    """All-steps InfoNCE over the global candidate pool without ever
    gathering it — drop-in for infonce_loss_and_metrics(negatives=
    'all_steps', axis_name=...) under shard_map. Loss/acc returned are
    LOCAL means; pmean them like any other DP metric."""
    B, Tp, K, D = preds_v.shape
    T = z.shape[1]
    shift = jax.lax.axis_index(axis_name) * B
    p_flat = preds_v.transpose(1, 2, 0, 3).reshape(Tp * K * B, D)
    z_flat = z.reshape(B * T, D)
    labels = _labels(B, Tp, K, T, shift)
    nll, correct = _ring_nll(p_flat, z_flat, labels, axis_name)
    loss = jnp.mean(nll)
    acc = jnp.mean(correct.reshape(Tp, K, B), axis=(0, 2))
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}


def ring_infonce_allsteps_ctx(
    preds: jnp.ndarray,  # (B_loc, T_loc, K, D) predictions for LOCAL steps
    z: jnp.ndarray,      # (B_loc, T_loc, D) local TIME chunk of the latents
    *,
    axis_name: str,
    data_axis: str | None = None,
) -> Tuple[jnp.ndarray, dict]:
    """All-steps InfoNCE with the TIME axis sharded — the loss half of
    context parallelism (parallel/cp.py; the batch-sharded DP twin is
    ring_infonce_allsteps above; same kernel, different chunk geometry).

    Device d of R holds steps [d*T_loc, (d+1)*T_loc) of every sequence.
    The candidate pool is the full B * (R*T_loc) global set, swept around
    the same ppermute ring; a prediction's positive z_{t+k+1} usually
    lives in ANOTHER device's chunk, which the ring visits. Rows outside
    the uniform context window t_global < T_global - K (only the last
    device has any) carry label -1 — they match no column, take zero
    cotangent through the valid-row mask, and are excluded from the
    psum-ed global means. Returns the GLOBAL loss/acc (identical on every
    device) matching infonce_loss_and_metrics(negatives='all_steps') on
    the gathered arrays — except argmax TIES in the accuracy metric: the
    ring pool is time-chunk-major while the gathered pool is batch-major,
    so a bit-exact score tie can crown a different (equally maximal)
    winner; loss and gradients are order-invariant and unaffected.

    With `data_axis` set (2-D DP x CP mesh: batch sharded over data_axis,
    time over axis_name) the SAME kernel sweeps one logical ring over the
    flattened (data, ctx) device set — jax flattens tuple axis_names
    row-major and ppermute/axis_index agree on that layout (ring_util) —
    so every prediction scores against the GLOBAL B_glob * T_glob pool
    with per-device state still one chunk + one score tile. A row's
    positive lives in its OWN data row (chunk me_d * R_c + t_tgt // T_loc):
    other data rows' chunks contribute negatives only. Loss/acc are global
    over both axes."""
    B, T_loc, K, D = preds.shape
    ax = (axis_name if data_axis is None else (data_axis, axis_name))
    R_c = jax.lax.axis_size(axis_name)
    me_c = jax.lax.axis_index(axis_name)
    T_glob = R_c * T_loc
    # rows ordered (t, k, i), matching the DP wrapper
    p_flat = preds.transpose(1, 2, 0, 3).reshape(T_loc * K * B, D)
    z_flat = z.reshape(B * T_loc, D)
    r = jnp.arange(T_loc * K * B)
    i = r % B
    tk = r // B
    k = tk % K
    t_glob = me_c * T_loc + tk // K
    t_tgt = t_glob + k + 1
    chunk = t_tgt // T_loc  # ctx ring position of the positive's chunk
    if data_axis is not None:
        # flattened (data-major) chunk id: the positive shares MY data row
        chunk = jax.lax.axis_index(data_axis) * R_c + chunk
    labels = chunk * (B * T_loc) + i * T_loc + t_tgt % T_loc
    valid = t_glob < T_glob - K
    labels = jnp.where(valid, labels, -1)
    nll, correct = _ring_nll(p_flat, z_flat, labels, ax)
    w = valid.astype(jnp.float32)
    if data_axis is not None:
        # valid depends on the ctx position only — mark it varying over the
        # data axis too so the tuple-axis psums below pass the vma check
        w = pvary(w, data_axis)
    n_valid = jax.lax.psum(jnp.sum(w), ax)
    loss = jax.lax.psum(jnp.sum(nll * w), ax) / n_valid
    ck = (correct * w).reshape(T_loc, K, B)
    wk = w.reshape(T_loc, K, B)
    acc = (jax.lax.psum(jnp.sum(ck, axis=(0, 2)), ax)
           / jax.lax.psum(jnp.sum(wk, axis=(0, 2)), ax))
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
