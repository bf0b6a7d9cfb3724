"""Device mesh and sharding helpers (SURVEY.md §2 N1, §6.8).

The reference is single-process with zero parallelism (SURVEY.md §3 note);
data parallelism over ICI is first-class in this rebuild (BASELINE.json:10):
a 1-D 'data' mesh, parameters replicated, batch sharded, gradients psum-med
by XLA, and encoder latents all-gathered for cross-replica negative sharing.
All collectives are XLA-inserted (jit + NamedSharding) or explicit
(shard_map + lax collectives in cpc_tpu.parallel.dp) — never host-side.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Builds a mesh over all (or given) devices; one -1 axis is inferred."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n} devices, have "
            f"{len(devices)}")
    if n != len(devices):
        import warnings
        warnings.warn(
            f"mesh shape {tuple(shape)} uses {n} of {len(devices)} devices "
            f"— pass devices= explicitly if the subset is intentional",
            stacklevel=2)
        devices = devices[:n]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
