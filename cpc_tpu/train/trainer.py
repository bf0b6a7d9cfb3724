"""Trainer: the outer loop around the jitted step (SURVEY.md §2 N4, §4.1).

Replaces the reference's ContrastiveEstimationTrainer.train/validate
(SURVEY.md §3 "Trainer"): epoch-agnostic step loop, periodic validation,
async orbax snapshots, metric logging, exact resume. The device never waits
on the host: batches are assembled by the Batcher's prefetch thread while the
previous step runs.
"""

from __future__ import annotations

import signal
import threading
import time
from typing import Dict, Optional

import jax
import numpy as np

from cpc_tpu.config import CPCConfig
from cpc_tpu.data.dataset import SnippetDataset
from cpc_tpu.data.loader import Batcher, load_device_corpus, to_device
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.parallel import multihost
from cpc_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from cpc_tpu.train.checkpoint import CheckpointManager
from cpc_tpu.train.metrics import MetricWriter
from cpc_tpu.train.train_step import init_state, make_step_fns


class Trainer:
    def __init__(
        self,
        cfg: CPCConfig,
        train_dataset: SnippetDataset,
        val_dataset: Optional[SnippetDataset] = None,
        workdir: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = CPCModel(cfg.model)
        par = cfg.train.parallel
        if par not in ("dp", "cp", "dpcp"):
            raise ValueError(f"train.parallel must be 'dp'|'cp'|'dpcp', "
                             f"got {par!r}")
        mesh_shape, mesh_axes = cfg.train.mesh_shape, cfg.train.mesh_axes
        if par == "cp" and mesh_axes == ("data",):
            # the default axes name DP; 'cp' wants the context axis. Only
            # the NAME is substituted — a user-set mesh_shape (device
            # subset) is preserved
            mesh_axes = ("ctx",)
        self.mesh = mesh if mesh is not None else make_mesh(
            mesh_shape, mesh_axes)
        if par == "dpcp" and not {"data", "ctx"} <= set(self.mesh.shape):
            raise ValueError(
                "train.parallel='dpcp' needs a 2-D mesh with 'data' and "
                f"'ctx' axes — set train.mesh_shape/mesh_axes (got axes "
                f"{tuple(self.mesh.shape)})")
        dp_div = (self.mesh.size if par == "dp"
                  else self.mesh.shape["data"] if par == "dpcp" else 1)
        if cfg.data.batch_size % dp_div != 0:
            raise ValueError(
                f"batch_size {cfg.data.batch_size} is not divisible by the "
                f"{dp_div}-way data axis; pass a compatible mesh= or "
                f"adjust data.batch_size")
        if par != "dp":
            ctx = self.mesh.shape["ctx"]
            if cfg.data.snippet_samples % ctx:
                # fail here with the reason, not in device_put's generic
                # uneven-shard error when the first batch is staged
                raise ValueError(
                    f"data.snippet_samples {cfg.data.snippet_samples} is "
                    f"not divisible by the {ctx}-way ctx mesh axis — CP "
                    f"shards the snippet's time axis; adjust "
                    f"snippet_samples or the mesh")
            if multihost.active() and par == "cp":
                raise ValueError(
                    "train.parallel='cp' has no batch axis for processes "
                    "to contribute rows along; use 'dpcp' with the 'data' "
                    "axis spanning processes (the ctx ring then stays on "
                    "each process's fast interconnect)")
            from cpc_tpu.parallel.cp import make_cp_step_fns
            self.steps = make_cp_step_fns(
                cfg, self.mesh,
                dp_axis=("data" if par == "dpcp" else None))
        else:
            self.steps = make_step_fns(cfg, self.model, self.mesh)
        if par != "dp":
            # Init must NOT materialize the global (B, S) forward on one
            # device — that activation set is exactly what CP shards. Param
            # shapes are input-size-independent, and the ring-family attn
            # impls share the plain flax-MHA param tree, so init a tiny
            # xla-impl clone instead.
            import dataclasses as _dc
            icfg = cfg
            if cfg.model.ar.attn_impl != "xla":
                icfg = _dc.replace(cfg, model=_dc.replace(
                    cfg.model, ar=_dc.replace(cfg.model.ar,
                                              attn_impl="xla")))
            stride = 1
            for s in cfg.model.encoder.strides:
                stride *= s
            t_init = min(8, cfg.model.ar.max_len)
            self.params, self.opt_state = init_state(
                icfg, CPCModel(icfg.model), self.steps.optimizer,
                sample_shape=(1, t_init * stride))
        else:
            self.params, self.opt_state = init_state(cfg, self.model,
                                                     self.steps.optimizer)
        # multi-process (multi-host) run: same SPMD step over a mesh that
        # spans processes. Host-side differences only — see parallel/
        # multihost.py. Init is deterministic (seeded), so every process
        # holds identical values; replicate() lifts them to global arrays.
        self._mh = multihost.active()
        if self._mh:
            if self.mesh.devices.size != jax.device_count():
                raise ValueError(
                    f"multi-process training needs the mesh to span all "
                    f"{jax.device_count()} global devices, got "
                    f"{self.mesh.devices.size} (per-process sub-meshes "
                    f"cannot run one SPMD program)")
            self.params = multihost.replicate(self.params, self.mesh)
            self.opt_state = multihost.replicate(self.opt_state, self.mesh)
        # device_corpus: the whole int16 corpus lives in HBM; the Batcher
        # yields (B,) index vectors in the SAME (seed, epoch, pos) order —
        # resume state and batch contents are identical to the host path
        dc = cfg.data.device_corpus
        # under DP the corpus is replicated over the mesh (every replica
        # gathers its own batch rows locally — see make_step_fns)
        self._corpus = self._load_corpus(train_dataset) if dc else None
        self.batcher = Batcher(
            train_dataset, cfg.data.batch_size, shuffle=cfg.data.shuffle,
            seed=cfg.train.seed, prefetch=cfg.data.prefetch,
            transfer_dtype=cfg.data.transfer_dtype,
            num_workers=cfg.data.num_workers,
            yield_indices=dc,
        )
        self.val_batcher = None
        self._val_corpus = None
        if val_dataset is not None:
            if dc:
                # reuse the train corpus when the val dataset indexes the
                # SAME snippets (same files + geometry — distinct python
                # objects over one corpus dir are common, e.g. the CLI);
                # a second upload would double HBM and host decode
                same = val_dataset is train_dataset or (
                    type(val_dataset) is type(train_dataset)
                    and val_dataset.files == train_dataset.files
                    and val_dataset.snippet_samples
                        == train_dataset.snippet_samples
                    and val_dataset.snippet_stride
                        == train_dataset.snippet_stride)
                self._val_corpus = (self._corpus if same
                                    else self._load_corpus(val_dataset))
            self.val_batcher = Batcher(
                val_dataset, cfg.data.batch_size, shuffle=False,
                seed=0, transfer_dtype=cfg.data.transfer_dtype,
                yield_indices=dc)
        main = not self._mh or multihost.is_main()
        # metrics/config are process-0's job; checkpoints go through orbax
        # COOPERATIVELY (every process calls save/restore on the shared
        # workdir — orbax writes replicated data from the primary host and
        # syncs the others), with async off: an async save's background
        # barrier from a process that has moved on deadlocks the rest
        self.writer = MetricWriter(workdir if main else None, echo=main)
        self.ckpt = (CheckpointManager(f"{workdir}/{cfg.train.checkpoint_dir}",
                                       cfg.train.keep_checkpoints,
                                       async_save=not self._mh)
                     if workdir else None)
        if workdir and main:
            # persist the RESOLVED config (after CLI overrides) so the run
            # is reproducible and eval can probe with the exact training
            # config instead of trusting the caller to re-pass flags
            import json
            import os
            from cpc_tpu.config import to_dict
            os.makedirs(workdir, exist_ok=True)
            with open(os.path.join(workdir, "config.json"), "w") as f:
                json.dump(to_dict(cfg), f, indent=1)
        self.step = 0
        self.preempted = False
        if par != "dp":
            # the (B, S) wire batch is sharded along TIME (and batch, for
            # dpcp) — the CP step's device_prepare/loss run on those shards.
            # device_corpus indices shard over the data axis only (the
            # on-device gather produces the time axis, which GSPMD slices
            # onto 'ctx'): a separate 1-D sharding, hoisted off _stage's
            # per-step path
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._sharding = NamedSharding(
                self.mesh, P("data" if par == "dpcp" else None, "ctx"))
            self._idx_sharding = NamedSharding(
                self.mesh, P("data" if par == "dpcp" else None))
        else:
            self._sharding = (batch_sharding(self.mesh)
                              if self.mesh.size > 1 else None)
            self._idx_sharding = self._sharding

    def maybe_resume(self) -> bool:
        """Restore latest checkpoint if present; returns True if resumed."""
        if self.ckpt is None:
            return False
        # under multi-process the checkpoint payload is host-local numpy
        # (see _ckpt_state), so restore against matching templates on
        # every process, then re-replicate
        got = self.ckpt.restore_latest(*self._ckpt_state())
        if got is None:
            return False
        self.params, self.opt_state, self.step, batcher_state = got
        if self._mh:
            self.params = multihost.replicate(self.params, self.mesh)
            self.opt_state = multihost.replicate(self.opt_state, self.mesh)
        elif self.mesh.size > 1:
            # orbax restores onto the default device; re-replicate over the mesh
            rep = replicated(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
        self.batcher.restore(batcher_state)
        return True

    def _load_corpus(self, dataset):
        corpus = load_device_corpus(dataset)
        if self._mh:
            # every process decodes the same snippets (deterministic
            # dataset order), so lifting to a replicated global array is
            # value-correct
            return multihost.replicate(corpus, self.mesh)
        if self.mesh.size > 1:
            corpus = jax.device_put(corpus, replicated(self.mesh))
        return corpus

    def _stage(self, host_batch):
        """Host batch -> device array under the trainer's sharding (each
        process contributes its own rows under multi-process)."""
        sh = self._sharding
        if self._corpus is not None and np.ndim(host_batch) == 1:
            # device_corpus wire: host_batch is the (B,) index vector,
            # sharded over the data axis only (see __init__)
            sh = self._idx_sharding
        if self._mh:
            return multihost.shard_batch(host_batch, sh)
        return to_device(host_batch, sh)

    def _ckpt_state(self):
        """(params, opt_state) as the checkpoint payload: host-local numpy
        under multi-process (identical on every process — orbax writes
        once from the primary), live arrays otherwise."""
        if self._mh:
            return (multihost.host_local(self.params),
                    multihost.host_local(self.opt_state))
        return self.params, self.opt_state

    # distinct from None: signal.signal() legitimately returns None when the
    # previous handler was installed from C, and that case must still be
    # restored (to SIG_DFL) or our closure pins this Trainer process-wide
    _NOT_INSTALLED = object()

    def _install_sigterm_handler(self):
        """Preemption notice (TPU pools send SIGTERM before reclaim): flag
        the loop so it checkpoints and returns cleanly instead of dying
        with progress since the last periodic save. Signal handlers only
        exist in the main thread; elsewhere this is a no-op (the SIGKILL
        resume path still covers hard kills)."""
        if threading.current_thread() is not threading.main_thread():
            return self._NOT_INSTALLED
        def handler(signum, frame):
            self.preempted = True
        return signal.signal(signal.SIGTERM, handler)

    def train(self, num_steps: Optional[int] = None) -> Dict:
        cfg = self.cfg.train
        total = num_steps if num_steps is not None else cfg.num_steps
        # a fresh train() call starts un-preempted: a SIGTERM during an
        # earlier call must not make every later call stop after one step
        self.preempted = False
        prev_handler = self._install_sigterm_handler()
        try:
            return self._train_loop(cfg, total)
        finally:
            if prev_handler is not self._NOT_INSTALLED:
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)

    def _train_loop(self, cfg, total) -> Dict:
        it = iter(self.batcher)
        last_metrics: Dict = {}
        t_log = time.time()
        steps_since_log = 0
        audio_sec_per_batch = (
            self.cfg.data.batch_size * self.cfg.data.snippet_samples
            / self.cfg.data.sample_rate)
        from cpc_tpu.train.train_step import needs_rng
        aug_key = (jax.random.key(cfg.seed + 0x5EED)
                   if needs_rng(self.cfg) else None)
        while self.step < total:
            _, _, host_batch = next(it)
            batch = self._stage(host_batch)
            if aug_key is not None:
                # per-step key keeps augmentation reproducible and
                # resume-exact (step count is checkpointed)
                rng = jax.random.fold_in(aug_key, self.step)
            if self._corpus is not None:
                # host_batch is the (B,) index vector; gather runs on device
                args = (self.params, self.opt_state, self._corpus, batch)
            else:
                args = (self.params, self.opt_state, batch)
            if aug_key is not None:
                self.params, self.opt_state, metrics = self.steps.train_step(
                    *args, rng)
            else:
                self.params, self.opt_state, metrics = self.steps.train_step(
                    *args)
            self.step += 1
            steps_since_log += 1
            if self.step % cfg.log_every == 0 or self.step == total:
                # on axon, block_until_ready is a no-op; a host fetch is the
                # only real sync — fetch BEFORE reading the clock
                last_metrics = {k: np.asarray(v) for k, v in metrics.items()}
                dt = time.time() - t_log
                thr = steps_since_log * audio_sec_per_batch / max(dt, 1e-9)
                last_metrics["audio_sec_per_sec"] = thr
                last_metrics["steps_per_sec"] = steps_since_log / max(dt, 1e-9)
                self.writer.write(self.step, last_metrics, "train")
                t_log = time.time()
                steps_since_log = 0
            if self.val_batcher is not None and self.step % cfg.eval_every == 0:
                self.writer.write(self.step, self.validate(), "val")
            if self.ckpt is not None and (
                    self.step % cfg.checkpoint_every == 0 or self.step == total):
                self.ckpt.save(self.step, *self._ckpt_state(),
                               self.batcher.state())
            preempt = self.preempted
            if self._mh:
                # the preemption save below is a COLLECTIVE orbax op, but
                # SIGTERM can land on a subset of hosts or straddle a step
                # boundary — so the decision must be collective too. Agree
                # at log boundaries only (an allgather per step would tax
                # every step; log_every bounds preemption latency to a few
                # seconds of steps, well inside preemption grace periods)
                preempt = (multihost.any_true(self.preempted)
                           if (self.step % cfg.log_every == 0
                               or self.step == total) else False)
            if preempt:
                if self.ckpt is not None and not (
                        self.step % cfg.checkpoint_every == 0
                        or self.step == total):  # not already saved above
                    self.ckpt.save(self.step, *self._ckpt_state(),
                                   self.batcher.state())
                self.writer.write(self.step,
                                  {"preempted": 1.0, **last_metrics}, "train")
                break
        if self.ckpt is not None:
            self.ckpt.wait()
        return last_metrics

    def validate(self, max_batches: int = 50) -> Dict:
        """Mean InfoNCE loss + per-k accuracy over the validation set
        (SURVEY.md §4.2)."""
        assert self.val_batcher is not None
        agg: Dict = {}
        n = 0
        for i, (_, _, host_batch) in enumerate(self.val_batcher.one_epoch()):
            if i >= max_batches:
                break
            batch = self._stage(host_batch)
            if self._val_corpus is not None:
                m = self.steps.eval_step(self.params, self._val_corpus,
                                         batch)
            else:
                m = self.steps.eval_step(self.params, batch)
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + np.asarray(v)
            n += 1
        return {k: v / max(n, 1) for k, v in agg.items()}

    def close(self):
        self.writer.close()
        if self.ckpt is not None:
            self.ckpt.close()
