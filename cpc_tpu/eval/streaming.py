"""Constant-memory streaming feature extraction (SURVEY.md §4.5 — the
Immersions-style real-time consumer).

`extract_features` (cpc_tpu.eval.features) computes trajectories over a
finite stream in sliding windows: latency = one window, and each window
recomputes its warm-up context. `StreamingExtractor` instead carries exact
state across arbitrary chunks:

  * encoder: a residual sample buffer of `receptive_field - 1` samples. The
    conv pyramid is applied with VALID padding over `residual + chunk`,
    which emits exactly the latents whose full receptive field is available
    — bit-equal to a VALID forward over the whole stream (the stride
    pyramid consumes blocks of `downsample` samples exactly, so chunk
    boundaries can never shift alignment).
  * gar: the GRU hidden state (num_layers, 1, H) is threaded between chunks
    (CPCModel.context_with_state), so c is the same recurrence as offline.

Latency is one chunk + receptive_field/2 instead of one window, and memory
is O(receptive_field + chunk), independent of stream length.

Contracts and deviations (explicit):
  * VALID semantics. The repo's training default is SAME padding (20480 →
    128 latents); a VALID stream forward equals the SAME forward everywhere
    except the zero-padded stream edges, and equals the reference's
    torch-default VALID semantics exactly (SURVEY.md §8.5 risk 1).
  * Normalization: training normalizes per 1.28 s snippet, which a stream
    cannot reproduce (it needs the whole snippet before its first sample).
    Pass corpus-level `stats=(mean, std)` for a fixed affine normalization,
    or None for raw samples. Encoder norms whose statistics span the time
    axis (norm='batch'/'group') are rejected for the same reason; 'layer'
    normalizes per position and streams exactly.
  * Compute is fp32 regardless of the training dtype: params are the fp32
    masters, inference features gain precision for free, and the fp32
    lax.scan GRU carry makes chunking exactly associative (the bf16 Pallas
    training path keeps fp32 hidden state in kernel scratch that cannot be
    carried across calls).
  * One stream per extractor (B = 1).
  * gar state: GRU carries its (num_layers, 1, H) hidden state; the
    transformer carries an explicit KV-cache pytree (per-layer K/V buffers
    + PER-STREAM positions — models/transformer.py decode_carry) and each
    pushed latent runs CausalTransformer.decode_step under lax.scan —
    exact equality with the offline forward, memory O(max_len). A
    transformer stream is bounded by ar.max_len latents, exactly like the
    offline forward (push() raises at the same point the offline call
    would), and individual streams recycle via reset_stream() because
    each batch row owns its position.

jit note: the jitted input is the sliced VALID window (rf + (n-1)*down
samples), not the raw buffer, so a fixed chunk size settles into at most
two window lengths after the first push — three compiled shapes total,
whatever the chunk size's remainder mod `down`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.models.cpc import CPCModel


def receptive_field(kernels, strides) -> Tuple[int, int]:
    """(receptive_field, total_downsample) of a strided conv pyramid:
    latent t depends on samples [t*down, t*down + rf)."""
    rf, jump = 1, 1
    for k, s in zip(kernels, strides):
        rf += (k - 1) * jump
        jump *= s
    return rf, jump


def portable_stream_model(cfg) -> CPCModel:
    """The streaming clone: VALID padding, fp32 compute, XLA-only paths,
    sharing the exact parameter tree of `cfg` (padding/dtype/kernel flags
    do not change parameter shapes). Validates the streaming-compatible
    encoder contract. Single source of truth for BOTH the live
    StreamingExtractor and the exported streaming step
    (cpc_tpu.export.export_streaming_step) — they must never diverge."""
    if cfg.encoder.kind != "conv1d":
        raise ValueError(
            "streaming extraction supports the conv1d encoder only "
            f"(got {cfg.encoder.kind!r}); the scalogram front-end is "
            "frame-based — use windowed extract_features")
    if cfg.encoder.norm in ("batch", "group"):
        raise ValueError(
            f"encoder norm {cfg.encoder.norm!r} computes statistics over "
            "the time axis, so chunked output would silently diverge "
            "from the offline forward; streaming supports norm "
            "'none'/'layer' (use windowed extract_features otherwise)")
    enc = dataclasses.replace(cfg.encoder, padding="VALID",
                              use_pallas=False)
    # attn_impl pinned to 'xla': the KV-cache decode twin IS flax-MHA math,
    # so the exact-equality contract (stream == offline) needs the offline
    # side on the same math; a flash-trained checkpoint streams identically
    # (the knob changes kernels, not parameters)
    ar = dataclasses.replace(cfg.ar, use_pallas=False, attn_impl="xla")
    return CPCModel(dataclasses.replace(cfg, encoder=enc, ar=ar,
                                        dtype="float32"))


class StreamingExtractor:
    """Feed chunks with push(), collect (z, c) increments; reset() restarts.

    Equality contract (tested): concatenating every push()'s outputs equals
    the offline VALID forward of the concatenated stream, elementwise."""

    def __init__(self, model: CPCModel, params, *,
                 stats: Optional[Tuple[float, float]] = None,
                 n_streams: int = 1):
        """n_streams > 1 serves that many INDEPENDENT streams in lockstep
        (every push carries one equal-length chunk per stream — the
        standard batched-serving shape): one jitted forward per push for
        the whole batch, per-stream GRU state rows / KV-cache batch rows.
        push() then takes (n_streams, T) and returns (n_streams, n, d)."""
        cfg = model.config
        if n_streams < 1:
            raise ValueError(f"n_streams must be >= 1, got {n_streams}")
        self.n_streams = n_streams
        if cfg.ar.kind not in ("gru", "transformer"):
            raise ValueError(f"unknown gar kind {cfg.ar.kind!r}")
        # VALID fp32 XLA clone (the fused Pallas pyramid is SAME-only and
        # the Pallas GRU cannot export its fp32 scratch state); shared
        # definition with the serving export — see portable_stream_model.
        self._model = portable_stream_model(cfg)
        self._params = params
        ar = self._model.config.ar
        self.rf, self.down = receptive_field(cfg.encoder.kernels,
                                             cfg.encoder.strides)
        if stats is not None:
            m, s = float(stats[0]), float(stats[1])
            if not (np.isfinite(m) and np.isfinite(s) and s > 0):
                raise ValueError(
                    f"stats=(mean, std) needs a finite positive std, got "
                    f"({m}, {s}) — (win - mean)/std would emit NaN/inf "
                    "frames forever")
            stats = (m, s)
        self._stats = stats
        self._is_tr = cfg.ar.kind == "transformer"
        if self._is_tr:
            from cpc_tpu.models.transformer import (CausalTransformer,
                                                    carry_decode_model,
                                                    decode_carry)
            # decode twin of the gar: same parameter tree, incremental
            # KV-cache decode_step path with the cache as an explicit
            # fixed-shape carry (per-stream positions — what makes
            # reset_stream and the StableHLO export possible)
            self._tr = carry_decode_model(ar)
            self._fresh_carry = lambda: decode_carry(ar, n_streams)
            self.max_latents = ar.max_len

            def tr_extend(gar_params, carry, z_tokens):
                # scan decode_step over the chunk's latents (time-major
                # (n, B, D)); carry rows = streams
                def step(carry, z_t):
                    c_t, carry = self._tr.apply(
                        {"params": gar_params}, z_t, carry,
                        method=CausalTransformer.decode_step)
                    return carry, c_t

                return jax.lax.scan(step, carry, z_tokens)

            self._tr_extend = jax.jit(tr_extend)
        self._fwd = jax.jit(self._forward)
        self._gru_ctx = jax.jit(self._gru_context)
        self.reset()

    def reset(self) -> None:
        self._resid = np.zeros((self.n_streams, 0), np.float32)
        self._h = None  # GRU: (num_layers, n_streams, H) after first push
        if self._is_tr:
            self._carry = self._fresh_carry()
            self._n_seen = np.zeros((self.n_streams,), np.int64)

    def reset_stream(self, i: int) -> None:
        """Recycle batch row `i` for a NEW stream without disturbing the
        others (serving churn: a caller's stream ends, another joins the
        lockstep batch). The row's gar state restarts — GRU: its hidden
        row zeroes (the fresh-stream h0); transformer: its carry position
        returns to 0, which both restarts the positional embedding and
        masks every stale KV entry beyond it (decode_carry's per-stream
        position vector is what makes this possible; the old flax decode
        cache shared ONE index across rows) — and its residual samples
        zero in place. The shared residual length is structural to the
        lockstep design, so the new stream behaves exactly as if preceded
        by that many zero samples: its post-reset outputs equal a fresh
        extractor fed `zeros(len(residual))` + the subsequent chunks
        (tested for both gar kinds)."""
        if not 0 <= i < self.n_streams:
            raise ValueError(f"stream index {i} out of range "
                             f"[0, {self.n_streams})")
        if self._is_tr:
            self._carry = dict(self._carry,
                               pos=self._carry["pos"].at[i].set(0))
            self._n_seen[i] = 0
        self._resid[i] = 0.0
        if self._h is not None:
            self._h = self._h.at[:, i, :].set(0.0)

    def _forward(self, params, buf):
        x = buf  # (n_streams, L)
        if self._stats is not None:
            mean, std = self._stats
            x = (x - mean) / std
        return self._model.apply(params, x, method=CPCModel.encode)

    def _gru_context(self, params, z, h):
        return self._model.apply(params, z, h,
                                 method=CPCModel.context_with_state)

    def push(self, chunk: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """chunk (T,) — or (n_streams, T) for a batched extractor — float32
        -> (z (n_new, d_enc), c (n_new, d_ar)), batched shapes
        (n_streams, n_new, d) when n_streams > 1; n_new is however many
        latents' receptive fields completed, possibly 0."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim == 1:
            chunk = np.broadcast_to(chunk, (1,) + chunk.shape) \
                if self.n_streams == 1 else chunk
        if chunk.ndim != 2 or chunk.shape[0] != self.n_streams:
            raise ValueError(
                f"chunk must be (T,) for one stream or ({self.n_streams}, T)"
                f"; got shape {chunk.shape}")
        buf = np.concatenate([self._resid, chunk], axis=1)
        L = buf.shape[1]
        d_enc = self._model.config.encoder.d_enc
        d_ar = self._model.config.ar.d_ar
        if L < self.rf:
            self._resid = buf
            shape = ((0, d_enc), (0, d_ar)) if self.n_streams == 1 else \
                ((self.n_streams, 0, d_enc), (self.n_streams, 0, d_ar))
            return np.zeros(shape[0], np.float32), np.zeros(shape[1],
                                                            np.float32)
        n = (L - self.rf) // self.down + 1
        window = buf[:, :self.rf + (n - 1) * self.down]
        z = self._fwd(self._params, jnp.asarray(window))
        if self._is_tr:
            if (self._n_seen + n > self.max_latents).any():
                worst = int(self._n_seen.max()) + n
                raise ValueError(
                    f"stream exceeds the transformer's positional table: "
                    f"{worst} latents > max_len "
                    f"{self.max_latents} (the offline forward rejects the "
                    f"same length); reset()/reset_stream() or raise "
                    f"ar.max_len")
            self._carry, c_tm = self._tr_extend(
                self._params["params"]["gar"], self._carry,
                z.transpose(1, 0, 2))  # (n, B, D) tokens
            c = jnp.transpose(c_tm, (1, 0, 2))
            self._n_seen += n
        else:
            c, self._h = self._gru_ctx(self._params, z, self._h)
        self._resid = buf[:, n * self.down:]
        z_np = np.asarray(z, np.float32)
        c_np = np.asarray(c, np.float32)
        if self.n_streams == 1:
            return z_np[0], c_np[0]
        return z_np, c_np
