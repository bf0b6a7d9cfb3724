"""Shared plumbing for the ppermute-ring kernels (infonce_ring.py — DP and
ctx chunk geometries — and attention_ring.py). One definition of the two
pieces that must stay in lockstep across all four ring scans:

  * the ring permutation (neighbor j -> j+1 mod R), and
  * the pcast-to-varying marking of scan-carried accumulators (shard_map's
    vma check requires carries that BECOME device-varying — everything
    folded with axis_index-dependent values does — to start marked varying;
    a jax-semantics change here retrofits once, not four times).
"""

from __future__ import annotations

import jax


def ring_perm(axis_name):
    """[(j, j+1 mod R)] — each device forwards its chunk to its neighbor.

    axis_name may be a single mesh axis or a TUPLE of axes: jax flattens a
    tuple row-major (index = idx_first * size_second + idx_second), and
    ppermute/axis_index agree on that layout, so one logical ring can sweep
    a 2-D (data, ctx) mesh — the DP x CP InfoNCE geometry."""
    R = jax.lax.axis_size(axis_name)
    return [(j, (j + 1) % R) for j in range(R)]


def pvary(x, axis_name):
    """Mark a scan-carry initializer device-varying over the ring axis
    (or axes — accepts the same str | tuple as ring_perm)."""
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    return jax.lax.pcast(x, axes, to="varying")
