"""Real-time feature server: raw PCM in, CPC feature frames out.

The reference has no serving entry point at all — its Immersions consumer
imports the training repo and calls the model in Python (SURVEY.md §4.5).
This module is the missing production front door: a process that reads a
raw mono PCM stream on stdin and writes float32 feature frames to stdout,
in constant memory, suitable for piping from `arecord`/`sox`/a socket
relay.

Two backends, same wire protocol:

  * `--artifact model.stream` — serves an exported streaming-step artifact
    (cpc_tpu/export.py::export_streaming_step). The compute is the frozen
    StableHLO blob; cpc_tpu supplies only the host-side window slicing,
    which it derives from the artifact's input shapes plus the encoder
    geometry recorded in the `PATH.json` sidecar. This is the deployment
    path: the serving host needs jax + the artifact, not flax/orbax or the
    checkpoint tree.
  * `--workdir RUNDIR` — serves a live checkpoint through
    cpc_tpu.eval.streaming.StreamingExtractor (GRU or transformer gar).
    This is the development path: no export step, and partial windows at
    chunk boundaries are handled latent-exactly by the extractor's
    residual buffer.

Wire protocol (documented in docs/API.md):
  stdin:  raw mono PCM, little-endian, `--in-format f32` (default) or
          `i16` (scaled by 1/32768 — the corpus wire format).
  stdout: consecutive float32-LE frames, one per latent step (160 input
          samples at the baseline encoder); each frame is d_ar values for
          `--emit c` (default), d_enc for `--emit z`, d_enc+d_ar for
          `--emit zc`.
  stderr: one JSON header line (frame geometry) at start, one JSON
          summary line (frames emitted, tail samples dropped) at EOF.

Both paths emit bit-identical frames for the same stream over every
COMPLETE window (the artifact is an export of the extractor's step;
equality is tested in tests/test_serve.py against the offline VALID
forward). Tail difference at EOF: the artifact path steps in fixed
windows and drops up to one window's tail latents (counted in the stderr
summary as dropped samples), while the live extractor emits every latent
whose receptive field completed — prefer --workdir when trailing frames
of a finite stream matter.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np


def _read_chunks(stream, nbytes: int):
    while True:
        b = stream.read(nbytes)
        if not b:
            return
        yield b


def _to_f32(raw: bytes, in_format: str, carry: bytes) -> tuple:
    """Decode a byte chunk (plus any carried partial sample) to float32."""
    buf = carry + raw
    itemsize = 4 if in_format == "f32" else 2
    n = len(buf) // itemsize
    body, rest = buf[: n * itemsize], buf[n * itemsize:]
    if in_format == "f32":
        x = np.frombuffer(body, "<f4").astype(np.float32)
    else:
        x = np.frombuffer(body, "<i2").astype(np.float32) / 32768.0
    return x, rest


class _ArtifactStream:
    """Fixed-window streaming over an exported streaming-step artifact.

    GRU artifacts compute f(h, window (1, W)) -> (z, c, h'); transformer
    artifacts carry their KV cache explicitly, f(k, v, pos, window) ->
    (z, c, k', v', pos') (models/transformer.py decode_step). The
    signature is detected from the artifact input shapes; this class owns
    the rolling sample buffer and threads whichever state the artifact
    declares. Window geometry (W, hop, n latents per call) is derived
    from the artifact input shapes and the encoder kernels/strides in the
    sidecar config — the same arithmetic as
    eval/streaming.py::receptive_field.
    """

    def __init__(self, path: str):
        from cpc_tpu.eval.streaming import receptive_field
        from cpc_tpu.export import load_artifact

        self._art = load_artifact(path)
        avals = self._art.in_avals
        if len(avals) == 2 and len(avals[0].shape) == 3:
            self._is_tr = False          # f(h, window)
        elif len(avals) == 4 and len(avals[0].shape) == 5:
            self._is_tr = True           # f(k, v, pos, window)
            self.max_latents = int(avals[0].shape[2])
            self._seen = 0
        else:
            raise SystemExit(
                f"{path} is not a streaming-step artifact (inputs "
                f"{[str(a) for a in avals]}); export one with "
                "--export-model PATH --export-streaming N_LATENTS")
        n_streams, self.window = avals[-1].shape
        if n_streams != 1:
            raise SystemExit(
                f"the serve CLI feeds ONE stdin stream; this artifact was "
                f"exported with n_streams={n_streams} (use the batched "
                f"artifact from your own host code, or re-export with "
                f"--export-streams 1)")
        sidecar = path + ".json"
        try:
            with open(sidecar) as f:
                cfg = json.load(f)["config"]
        except (OSError, KeyError, ValueError) as e:  # incl. corrupt JSON
            raise SystemExit(
                f"cannot read encoder geometry: {sidecar} missing or "
                f"without a 'config' entry ({e}); re-export via "
                "`python -m cpc_tpu.eval --export-model` (it writes the "
                "sidecar) or serve from --workdir instead")
        enc = cfg["model"]["encoder"]
        self.rf, self.down = receptive_field(enc["kernels"], enc["strides"])
        self.n_latents = (self.window - self.rf) // self.down + 1
        self.hop = self.n_latents * self.down
        self.d_enc = int(enc["d_enc"])
        self.d_ar = int(cfg["model"]["ar"]["d_ar"])
        if self._is_tr:
            self._k = np.zeros(tuple(avals[0].shape), np.float32)
            self._v = np.zeros(tuple(avals[1].shape), np.float32)
            self._pos = np.zeros(tuple(avals[2].shape), np.int32)
        else:
            self._h = np.zeros(tuple(avals[0].shape), np.float32)
        self._buf = np.zeros(0, np.float32)

    def _step(self, win):
        import jax.numpy as jnp

        if self._is_tr:
            if self._seen + self.n_latents > self.max_latents:
                # past the positional table the artifact's indices CLAMP
                # (silent corruption) — stop loudly instead. The live
                # --workdir path raises at the identical point.
                raise SystemExit(
                    f"stream exceeds the transformer artifact's positional "
                    f"table ({self.max_latents} latents); restart the "
                    f"server per stream or re-export with a larger "
                    f"ar.max_len")
            z, c, self._k, self._v, self._pos = self._art.call(
                jnp.asarray(self._k), jnp.asarray(self._v),
                jnp.asarray(self._pos), jnp.asarray(win))
            self._seen += self.n_latents
        else:
            z, c, h = self._art.call(jnp.asarray(self._h), jnp.asarray(win))
            self._h = np.asarray(h, np.float32)
        return z, c

    def push(self, x: np.ndarray):
        """Returns (z (n, d_enc), c (n, d_ar)) for every COMPLETE window."""
        self._buf = np.concatenate([self._buf, x])
        zs, cs = [], []
        while self._buf.shape[0] >= self.window:
            win = self._buf[: self.window][None]
            z, c = self._step(win)
            zs.append(np.asarray(z, np.float32)[0])
            cs.append(np.asarray(c, np.float32)[0])
            self._buf = self._buf[self.hop:]
        if not zs:
            return (np.zeros((0, self.d_enc), np.float32),
                    np.zeros((0, self.d_ar), np.float32))
        return np.concatenate(zs), np.concatenate(cs)

    @property
    def pending_samples(self) -> int:
        return int(self._buf.shape[0])


class _LiveStream:
    """StreamingExtractor over the latest checkpoint in a workdir."""

    def __init__(self, workdir: str, stats):
        from cpc_tpu.config import from_dict
        from cpc_tpu.eval.streaming import StreamingExtractor
        from cpc_tpu.models.cpc import CPCModel
        from cpc_tpu.train.checkpoint import CheckpointManager
        from cpc_tpu.train.train_step import init_state, make_step_fns

        cfg_path = os.path.join(workdir, "config.json")
        try:
            with open(cfg_path) as f:
                cfg = from_dict(json.load(f))
        except OSError as e:
            raise SystemExit(f"no persisted config at {cfg_path} ({e}); "
                             "serve needs the run's exact model geometry")
        model = CPCModel(cfg.model)
        steps = make_step_fns(cfg, model, mesh=None)
        params, opt_state = init_state(cfg, model, steps.optimizer)
        ckpt = CheckpointManager(
            os.path.join(workdir, cfg.train.checkpoint_dir),
            cfg.train.keep_checkpoints)
        restored = ckpt.restore_latest(params, opt_state)
        ckpt.close()
        if restored is None:
            raise SystemExit(f"no checkpoint under {workdir}")
        params, _, self.step, _ = restored
        if cfg.data.normalize and stats is None:
            # mirror the export path's warning (eval/cli.py): the run
            # trained on per-snippet-normalized input a stream cannot
            # reproduce; raw samples silently degrade feature quality
            print(json.dumps({"warning": (
                "this run trained with per-snippet normalization; serving "
                "without --stats MEAN STD feeds RAW samples — pass "
                "corpus-level stats for a fixed input normalization")}),
                file=sys.stderr, flush=True)
        self._ex = StreamingExtractor(model, params, stats=stats)
        self.down = self._ex.down
        self.rf = self._ex.rf
        self.d_enc = cfg.model.encoder.d_enc
        self.d_ar = cfg.model.ar.d_ar

    def push(self, x: np.ndarray):
        return self._ex.push(x)

    @property
    def pending_samples(self) -> int:
        return int(self._ex._resid.shape[1])


def main(argv: Optional[list] = None, stdin=None, stdout=None,
         stderr=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m cpc_tpu.serve",
        description="stream raw PCM on stdin -> float32 CPC feature "
                    "frames on stdout (see module docstring)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", metavar="PATH",
                     help="exported streaming-step artifact "
                          "(--export-streaming; needs its PATH.json "
                          "sidecar for encoder geometry)")
    src.add_argument("--workdir", metavar="DIR",
                     help="serve the latest checkpoint of a training run "
                          "(live model; GRU or transformer gar)")
    p.add_argument("--emit", default="c", choices=["c", "z", "zc"],
                   help="frame contents: context c (default), latents z, "
                        "or z+c concatenated")
    p.add_argument("--in-format", default="f32", choices=["f32", "i16"],
                   help="stdin sample format (little-endian mono; i16 is "
                        "scaled by 1/32768, the corpus wire format)")
    p.add_argument("--stats", type=float, nargs=2, default=None,
                   metavar=("MEAN", "STD"),
                   help="--workdir only: fixed input normalization "
                        "(x-MEAN)/STD. Artifacts bake theirs at export")
    p.add_argument("--chunk-samples", type=int, default=16000,
                   help="stdin read granularity (latency/throughput "
                        "trade; frames flush after every chunk)")
    p.add_argument("--info", action="store_true",
                   help="print the stream geometry JSON and exit")
    args = p.parse_args(argv)
    if args.stats is not None and args.artifact:
        p.error("--stats applies to --workdir (artifacts bake "
                "normalization at export time — see --export-stats)")
    if args.chunk_samples < 1:
        p.error(f"--chunk-samples must be >= 1, got {args.chunk_samples}")

    stdin = stdin if stdin is not None else sys.stdin.buffer
    stdout = stdout if stdout is not None else sys.stdout.buffer
    stderr = stderr if stderr is not None else sys.stderr

    if args.artifact:
        stream = _ArtifactStream(args.artifact)
    else:
        stream = _LiveStream(args.workdir, args.stats)

    frame_dim = {"c": stream.d_ar, "z": stream.d_enc,
                 "zc": stream.d_enc + stream.d_ar}[args.emit]
    header = {"emit": args.emit, "frame_dim": frame_dim,
              "frame_stride_samples": stream.down,
              "receptive_field_samples": stream.rf,
              "d_enc": stream.d_enc, "d_ar": stream.d_ar}
    print(json.dumps(header), file=stderr, flush=True)
    if args.info:
        return 0

    itemsize = 4 if args.in_format == "f32" else 2
    carry = b""
    frames = 0
    for raw in _read_chunks(stdin, args.chunk_samples * itemsize):
        x, carry = _to_f32(raw, args.in_format, carry)
        if x.size == 0:
            continue
        z, c = stream.push(x)
        if z.shape[0]:
            out = {"c": c, "z": z,
                   "zc": np.concatenate([z, c], axis=1)}[args.emit]
            stdout.write(np.ascontiguousarray(out, np.float32).tobytes())
            stdout.flush()
            frames += z.shape[0]
    print(json.dumps({"frames": frames,
                      "dropped_tail_samples": stream.pending_samples,
                      "dropped_partial_bytes": len(carry)}),
          file=stderr, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
