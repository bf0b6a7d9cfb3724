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


def ring_perm(axis_name: str):
    """[(j, j+1 mod R)] — each device forwards its chunk to its neighbor."""
    R = jax.lax.axis_size(axis_name)
    return [(j, (j + 1) % R) for j in range(R)]


def pvary(x, axis_name: str):
    """Mark a scan-carry initializer device-varying over the ring axis."""
    return jax.lax.pcast(x, (axis_name,), to="varying")
