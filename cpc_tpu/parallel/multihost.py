"""Multi-process (multi-host) runtime: DP training across process
boundaries (SURVEY.md §6.8 "DCN for multi-slice later" — this is that
piece).

The single-process story shards a global batch over one process's devices
(cpc_tpu.parallel.dp). On a real pod each host owns a subset of the chips
and only its slice of every global array is addressable; the SPMD program
is unchanged (the same shard_map/psum/all-gather train step runs on every
process), but the HOST side needs four things this module provides:

  * `initialize()` — jax.distributed bring-up (coordinator rendezvous;
    Gloo/ICI collectives between processes).
  * `replicate(tree, mesh)` — turn identical per-host values (params,
    optimizer state) into globally-replicated jax.Arrays. Every process
    must call it with the SAME values (same init seed guarantees this).
  * `shard_batch(host_batch, sharding)` — each process assembles the SAME
    deterministic global batch (the Batcher is seeded), then contributes
    only the rows its own devices own; returns the global array.
  * `host_local(tree)` — pull replicated global arrays back to plain
    numpy so ONE process can checkpoint/log them without dragging the
    others through a collective.

Design choice: checkpoints go through orbax COOPERATIVELY — every
process calls save/restore on the shared workdir with the same
host-local numpy payload (identical on every process by replication);
orbax writes once from the primary host and synchronizes the others.
Saves are therefore collective operations: every process must enter
them at the same step, which is why the Trainer's preemption save runs
behind `any_true()` flag agreement. Async saving is off under
multi-process (an async save's background barrier from a process that
has moved on deadlocks the rest). `workdir` must be shared (or synced)
across processes — the same requirement the reference's torch.save
story has.

Tested in tests/test_multihost.py: a 2-process x 4-device CPU run must
produce the EXACT loss trajectory of the single-process 8-device run
(same global batch, same collectives — fp32 CPU is deterministic), and
kill/resume must continue bitwise, both through the ordinary Trainer.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up. On real TPU pods call with no arguments
    (the platform autodetects coordinator and topology); explicit
    arguments are for CPU rehearsal and non-TPU clusters."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def active() -> bool:
    """True when this run spans more than one process."""
    return jax.process_count() > 1


def is_main() -> bool:
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process sync point (e.g. 'corpus generated' — writers
    before readers; see cpc_tpu.train.cli's synthetic-data path)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def any_true(flag: bool) -> bool:
    """Cross-process OR of a host-side flag. COLLECTIVE: every process
    must call it at the same point. The Trainer uses it to agree on
    preemption — a SIGTERM can land on a subset of hosts or straddle a
    step boundary, and the checkpoint save it triggers is itself a
    collective op that deadlocks unless all processes enter it."""
    from jax.experimental import multihost_utils
    return bool(np.asarray(
        multihost_utils.process_allgather(np.asarray(flag))).any())


def replicate(tree, mesh: Mesh):
    """Host values (identical on every process) -> globally-replicated
    jax.Arrays over `mesh`. Works in single-process meshes too (plain
    device_put), so callers need no branching."""
    rep = NamedSharding(mesh, P())
    if not active():
        return jax.device_put(tree, rep)

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, x, x.shape)

    return jax.tree.map(one, tree)


def shard_batch(host_batch: np.ndarray, sharding: NamedSharding):
    """Full deterministic global batch (same on every process) -> global
    array sharded by `sharding`; this process contributes the leading-axis
    rows its devices own. Replicated-batch shardings are rejected — use
    replicate() for those."""
    host_batch = np.asarray(host_batch)
    gshape = host_batch.shape
    spans = sorted(set(
        (idx[0].start or 0,
         gshape[0] if idx[0].stop is None else idx[0].stop)
        for idx in
        sharding.addressable_devices_indices_map(gshape).values()))
    lo, hi = spans[0][0], spans[-1][1]
    # make_array_from_process_local_data takes ONE local block per
    # process; a mesh whose device order interleaves processes would make
    # this process's rows non-contiguous and silently mis-assign them
    pos = lo
    for a, b in spans:
        if a > pos:
            raise ValueError(
                f"this process's batch rows are not one contiguous span "
                f"(gap at [{pos}, {a})): the mesh's device order "
                f"interleaves processes; build the mesh from jax.devices() "
                f"order (the default)")
        pos = max(pos, b)
    if (lo, hi) == (0, gshape[0]) and active():
        raise ValueError(
            "sharding does not split the leading axis across processes; "
            "use replicate() for replicated inputs")
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(host_batch[lo:hi]), gshape)


def host_local(tree):
    """Globally-replicated tree -> plain numpy (local replica), for
    single-process checkpointing/logging of multi-process state."""
    return jax.tree.map(
        lambda a: np.asarray(a.addressable_data(0))
        if isinstance(a, jax.Array) else a, tree)
