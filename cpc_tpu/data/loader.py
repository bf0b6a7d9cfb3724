"""Host batching + prefetch: the TPU-native replacement for
torch.utils.data.DataLoader worker processes (SURVEY.md §2 N0, §4.1).

Design: a background thread assembles int16 batches (half the host->device
bytes of fp32; dequant runs on device, cpc_tpu.ops.dsp) while the device is
busy with the previous step; `device_prepare` is the jit-side half. Epoch
shuffling is deterministic in (seed, epoch) so runs are reproducible and
resume-exact (SURVEY.md §6.4: the iterator state in a checkpoint is just
(seed, epoch, position)).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.data.dataset import SnippetDataset
from cpc_tpu.ops.dsp import prepare_waveform


def device_prepare(batch: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """On-device half of the pipeline: int16 -> float32, normalize. Call this
    INSIDE the jitted train step so it fuses with the encoder."""
    return prepare_waveform(batch, normalize=normalize)


class Batcher:
    """Iterates (epoch, step, batch int16 (B, S)) with background prefetch.

    State is (seed, epoch, pos); `state()`/`restore()` give exact-resume
    semantics for checkpointing.
    """

    def __init__(
        self,
        dataset: SnippetDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        prefetch: int = 2,
        transfer_dtype: str = "int16",
        num_workers: int = 0,
        start_epoch: int = 0,
        start_pos: int = 0,
        yield_indices: bool = False,
    ):
        if len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} snippets < batch_size {batch_size}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.transfer_dtype = transfer_dtype
        self.epoch = start_epoch
        self.pos = start_pos  # batch index within the current epoch
        # device-corpus mode: yield the (B,) int32 snippet indices instead
        # of assembled waveforms — same order, same (seed, epoch, pos)
        # resume state, zero host decode (the gather runs on device against
        # a resident corpus; see Trainer/DataConfig.device_corpus)
        self.yield_indices = yield_indices
        self._pool = None
        if num_workers > 0:
            import concurrent.futures
            self._pool = concurrent.futures.ThreadPoolExecutor(num_workers)

    # -- checkpointable iterator state (SURVEY.md §6.4) --------------------
    def state(self) -> dict:
        return {"seed": self.seed, "epoch": self.epoch, "pos": self.pos}

    def restore(self, state: dict) -> None:
        self.seed = int(state["seed"])
        self.epoch = int(state["epoch"])
        self.pos = int(state["pos"])

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order

    def batches_per_epoch(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_remainder and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _assemble(self, order: np.ndarray, b: int) -> np.ndarray:
        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
        if self.yield_indices:
            return idxs.astype(np.int32)
        if self.transfer_dtype == "int16":
            # int16 snippets come from a per-file quantized cache, so batch
            # assembly is a pure int16 gather (~6x cheaper than quantizing
            # each batch)
            getter = self.dataset.snippet_int16
        else:
            getter = self.dataset.__getitem__
        if self._pool is not None:
            snips = np.stack(list(self._pool.map(
                getter, (int(i) for i in idxs))))
        else:
            snips = np.stack([getter(int(i)) for i in idxs])
        if self.transfer_dtype != "int16":
            snips = snips.astype(np.float32)
        return snips

    def one_epoch(self, epoch: int = 0) -> Iterator[tuple]:
        """Yields exactly one epoch's (epoch, step, batch) synchronously,
        without touching the resumable (seed, epoch, pos) state — the
        validation-loop iterator (Trainer.validate)."""
        order = self._epoch_order(epoch)
        for b in range(self.batches_per_epoch()):
            yield epoch, b, self._assemble(order, b)

    def __iter__(self) -> Iterator[tuple]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch, pos = self.epoch, self.pos
            try:
                while not stop.is_set():
                    order = self._epoch_order(epoch)
                    n_batches = self.batches_per_epoch()
                    while pos < n_batches and not stop.is_set():
                        q.put((epoch, pos, self._assemble(order, pos)))
                        pos += 1
                    epoch, pos = epoch + 1, 0
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                epoch, pos, batch = item
                # advance public state so .state() after a yield resumes
                # at the *next* batch
                self.epoch, self.pos = epoch, pos + 1
                if self.pos >= self.batches_per_epoch():
                    self.epoch, self.pos = epoch + 1, 0
                yield epoch, pos, batch
        finally:
            stop.set()
            # drain so the producer can exit its q.put. Broad except: this
            # also runs at interpreter shutdown via generator GC, where
            # module globals (queue.Empty) may already be torn down.
            while not q.empty():
                try:
                    q.get_nowait()
                except Exception:
                    break


def load_device_corpus(dataset: SnippetDataset,
                       budget_bytes: int = 4 << 30) -> jnp.ndarray:
    """Every snippet of `dataset` as ONE device-resident int16 array
    (N, S) — uploaded in a single transfer, then indexed on device by the
    device_corpus train step (DataConfig.device_corpus). Raises if the
    corpus exceeds `budget_bytes` (HBM is shared with params, grads,
    optimizer state, and activations)."""
    n = len(dataset)
    s = len(dataset.snippet_int16(0))
    total = n * s * 2
    if total > budget_bytes:
        raise ValueError(
            f"device_corpus: corpus is {total / 2**30:.2f} GiB "
            f"({n} snippets x {s} samples) > the {budget_bytes / 2**30:.0f} "
            "GiB HBM budget; use the host streaming path (or a packed "
            "memmap corpus) instead")
    host = np.empty((n, s), np.int16)
    for i in range(n):
        host[i] = dataset.snippet_int16(i)
    return jnp.asarray(host)


def to_device(batch: np.ndarray, sharding=None) -> jnp.ndarray:
    """Host->device transfer, optionally with a NamedSharding so each replica
    receives only its batch shard."""
    if sharding is not None:
        return jax.device_put(batch, sharding)
    return jnp.asarray(batch)
