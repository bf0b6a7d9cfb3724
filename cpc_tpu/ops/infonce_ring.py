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
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


def _labels(B: int, Tp: int, K: int, T: int, shift):
    """Global positive column per local row r = (t*K + k)*B + i."""
    r = jnp.arange(Tp * K * B)
    i = r % B
    tk = r // B
    k = tk % K
    t = tk // K
    return (shift + i) * T + (t + k + 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring_nll(p_flat, z_flat, shift, B, K, T, axis_name):
    """p_flat (rows, D) local predictions in (t, k, i) order; z_flat
    (B*T, D) local candidate chunk. Returns (nll, correct) per local row
    against the GLOBAL ring pool."""
    (nll, cor), _ = _ring_fwd(p_flat, z_flat, shift, B, K, T, axis_name)
    return nll, cor


def _ring_fwd(p_flat, z_flat, shift, B, K, T, axis_name):
    rows, _ = p_flat.shape
    n_loc = z_flat.shape[0]
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    labels = _labels(B, rows // (K * B), K, T, shift)
    perm = [(j, (j + 1) % R) for j in range(R)]
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

    init = (jnp.full((rows,), _NEG, jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.zeros((rows,), jnp.float32),
            jnp.full((rows,), _NEG, jnp.float32),
            jnp.full((rows,), jnp.iinfo(jnp.int32).max, jnp.int32),
            z_flat)
    # R-1 score+rotate steps, then the final chunk scored WITHOUT the
    # (discarded) last rotation — one chunk of ICI traffic saved per eval
    (m, l, slab, av, ai, z_last), _ = jax.lax.scan(
        step, init, jnp.arange(R - 1, dtype=jnp.int32))
    m, l, slab, av, ai = fold((m, l, slab, av, ai), z_last,
                              jnp.asarray(R - 1, jnp.int32))
    lse = m + jnp.log(l)
    nll = lse - slab
    correct = (ai == labels).astype(jnp.float32)
    return (nll, correct), (p_flat, z_flat, shift, lse)


def _ring_bwd(B, K, T, axis_name, res, cots):
    p_flat, z_flat, shift, lse = res
    g_nll, _ = cots  # argmax accuracy is non-differentiable
    rows, D = p_flat.shape
    n_loc = z_flat.shape[0]
    R = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    labels = _labels(B, rows // (K * B), K, T, shift)
    perm = [(j, (j + 1) % R) for j in range(R)]
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

    init = (jnp.zeros((rows, D), jnp.float32), z_flat,
            jnp.zeros((n_loc, D), jnp.float32))
    (dp, z_last, dz), _ = jax.lax.scan(step, init,
                                       jnp.arange(R - 1, dtype=jnp.int32))
    # final chunk: accumulate, then one last dz rotation brings it home —
    # z itself no longer needs to move
    dp, dz = contribute(dp, z_last, dz, jnp.asarray(R - 1, jnp.int32))
    dz = jax.lax.ppermute(dz, axis_name, perm)
    return dp.astype(p_flat.dtype), dz.astype(z_flat.dtype), None


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
    nll, correct = _ring_nll(p_flat, z_flat, shift, B, K, T, axis_name)
    loss = jnp.mean(nll)
    acc = jnp.mean(correct.reshape(Tp, K, B), axis=(0, 2))
    return loss, {"loss": loss, "acc": acc, "acc_mean": jnp.mean(acc)}
