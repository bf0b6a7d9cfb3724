"""Explicit data-parallel train step: shard_map over a 1-D 'data' mesh axis
with psum gradient reduction and all-gather cross-replica negative sharing
(SURVEY.md §2 N4, §6.8, BASELINE.json:10).

Semantics:
  * params/opt state replicated; batch sharded on its leading axis;
  * cross_replica=True  -> z is all-gathered inside the loss, so every replica
    scores against the GLOBAL batch: identical loss to running the whole batch
    on one device (tested in tests/test_dp.py);
  * cross_replica=False -> negatives stay replica-local (a strictly cheaper,
    different objective — kept for parity runs, SURVEY.md §8.4);
  * gradients/metrics are pmean-ed over the axis, so the update matches the
    single-device large-batch step (loss is already a global mean when
    cross_replica; when local, pmean gives the mean of per-replica means).

Collectives ride ICI via XLA's all_gather/psum — there is no host-side
communication anywhere.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def dp_train_step(
    step_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    donate: bool = True,
    with_rng: bool = False,
):
    """Wraps step_fn(params, opt_state, batch[, rng], axis_name=...) ->
    (params, opt_state, metrics) into a jitted shard_map over `mesh`.

    step_fn must do its own lax.pmean(grads/metrics, axis_name) — this wrapper
    only places the computation and shards the batch. With with_rng, a
    replicated PRNG key is passed through (the step folds in axis_index for
    per-replica randomness).
    """
    in_specs = (P(), P(), P(axis)) + ((P(),) if with_rng else ())
    wrapped = shard_map(
        functools.partial(step_fn, axis_name=axis),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    donate_args = (0, 1) if donate else ()
    return jax.jit(wrapped, donate_argnums=donate_args)


def dp_eval_step(eval_fn: Callable, mesh: Mesh, axis: str = "data"):
    wrapped = shard_map(
        functools.partial(eval_fn, axis_name=axis),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(wrapped)
