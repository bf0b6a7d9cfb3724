"""genc encoders: strided 1-D conv over waveform, and the 2-D conv scalogram
variant for music audio.

Reference capability (SURVEY.md §3 "Conv encoder genc", §A): 5x Conv1d,
channels 512, kernels (10,8,4,4,4), strides (5,4,2,2,2) => 160x downsample,
ReLU. TPU-first design notes:
  * layout is (B, T, C) so every conv lowers to an MXU-tiled convolution;
  * norms default off (parity); LayerNorm/GroupNorm and a stateless
    batch-stats norm (torch-BN training-mode math, no running averages —
    mutable state breaks pure-functional jit) are offered;
  * the fused Pallas conv pyramid (cpc_tpu.ops.conv_pallas) is a drop-in for
    the XLA path, parity-gated by tests/test_pallas_conv.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpc_tpu.config import EncoderConfig


def _activation(name: str):
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "tanh": jnp.tanh,
    }[name]


class _BatchStatsNorm(nn.Module):
    """BatchNorm over current-batch statistics, without running averages.

    The reference's genc uses torch BatchNorm1d (SURVEY.md §3 "ReLU/BN").
    Running averages are mutable state that breaks pure-functional jit, so
    this normalizes with the live batch's mean/var over every axis but
    channels — identical math to torch BN in training mode — with learned
    per-channel scale/bias. Stats are computed in fp32 regardless of the
    activation dtype; under shard_map DP they are replica-local.
    """

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    eps: float = 1e-5
    axis_name: Optional[str] = None  # psum stats over this mesh axis (CP:
    # the time axis is sharded, but BN stats span the GLOBAL (B, T) set)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        red = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        if self.axis_name is not None:
            n = jax.lax.psum(
                jnp.asarray(x32.size // x32.shape[-1], jnp.float32),
                self.axis_name)
            mean = jax.lax.psum(jnp.sum(x32, axis=red, keepdims=True),
                                self.axis_name) / n
            var = jax.lax.psum(
                jnp.sum((x32 - mean) ** 2, axis=red, keepdims=True),
                self.axis_name) / n
        else:
            mean = jnp.mean(x32, axis=red, keepdims=True)
            var = jnp.var(x32, axis=red, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          self.param_dtype)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def _norm_layer(norm: str, i: int, ch: int, dtype, param_dtype,
                cp_axis: Optional[str] = None):
    """Norm module for layer i, or None. Unknown values raise — a norm knob
    that silently does nothing is worse than an error (VERDICT r1 #4).
    LayerNorm/GroupNorm are per-position (CP-local); batch-stats norm under
    CP psums its statistics so they span the global (B, T) set."""
    if norm == "none":
        return None
    if norm == "layer":
        return nn.LayerNorm(dtype=dtype, param_dtype=param_dtype,
                            name=f"norm{i}")
    if norm == "group":
        # GroupNorm reduces over (T, grouped channels) — NOT per-position —
        # so under CP its statistics must combine across the time shards
        return nn.GroupNorm(num_groups=min(32, ch), dtype=dtype,
                            param_dtype=param_dtype, axis_name=cp_axis,
                            name=f"norm{i}")
    if norm == "batch":
        return _BatchStatsNorm(dtype=dtype, param_dtype=param_dtype,
                               axis_name=cp_axis, name=f"norm{i}")
    raise ValueError(
        f"unknown encoder norm {norm!r}; use none|layer|group|batch")


class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv with an IDENTICAL variable tree
    ({kernel, bias} under the module name), so checkpoints are interchangeable
    between the XLA path and the fused Pallas path."""

    kernel_size: int
    in_features: int
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class ConvEncoder(nn.Module):
    """Strided Conv1d pyramid: waveform (B, T) or (B, T, 1) -> z (B, T', d_enc).

    With config.use_pallas (SAME padding, no norm, relu), the whole pyramid
    runs as ONE fused Pallas kernel (cpc_tpu.ops.conv_pallas) — intermediate
    activations never touch HBM.

    With cp_axis set (context parallelism, parallel/cp.py), x is this
    device's TIME shard and every conv layer exchanges exactly its SAME-
    padding halo with its ring neighbors (pad_l samples leftward, pad_r
    rightward; the global edges keep the zeros SAME would insert), then
    runs padding-free — bit-equal to the global forward, with per-layer
    ICI traffic of a few samples. Requires padding='SAME' (VALID's ragged
    output length does not chunk evenly), use_pallas=False, and the local
    T divisible by prod(strides)."""

    config: EncoderConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    cp_axis: Optional[str] = None

    def setup(self):
        cfg = self.config
        if cfg.remat and cfg.use_pallas:
            raise ValueError(
                "encoder.remat has nothing to save under encoder.use_pallas "
                "— the fused Pallas pyramid never materializes intermediate "
                "activations in HBM; disable one of the two")
        convs, norms = [], []
        c_in = 1
        for i, (ch, k, s) in enumerate(
                zip(cfg.channels, cfg.kernels, cfg.strides)):
            if cfg.use_pallas:
                convs.append(_ConvParams(k, c_in, ch, self.param_dtype,
                                         name=f"conv{i}"))
            else:
                convs.append(nn.Conv(
                    features=ch,
                    kernel_size=(k,),
                    strides=(s,),
                    # under CP the exchanged halo IS the padding
                    padding="VALID" if self.cp_axis is not None
                    else cfg.padding,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{i}",
                ))
            norms.append(_norm_layer(cfg.norm, i, ch, self.dtype,
                                     self.param_dtype, cp_axis=self.cp_axis))
            c_in = ch
        self.convs = convs
        self.norms = norms

    def _layer(self, x: jnp.ndarray, i: int) -> jnp.ndarray:
        """One (conv, norm, act) block — the remat unit: with config.remat,
        only this block's INPUT stays live across the forward; the conv
        output and relu mask are recomputed during backprop."""
        x = self.convs[i](x)
        if self.norms[i] is not None:
            x = self.norms[i](x)
        return _activation(self.config.activation)(x)

    def _cp_layer(self, x: jnp.ndarray, i: int) -> jnp.ndarray:
        """CP twin of _layer: exchange this layer's SAME-padding halo with
        the ring neighbors first (ppermutes are replayed in the remat
        recompute), then conv padding-free."""
        cfg = self.config
        axis = self.cp_axis
        R = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        k, s = cfg.kernels[i], cfg.strides[i]
        # SAME splits max(k - s, 0) zeros as (total//2, rest); interior
        # devices receive REAL samples there instead — exchanged below
        pad = max(k - s, 0)
        pad_l, pad_r = pad // 2, pad - pad // 2
        fwd = [(j, (j + 1) % R) for j in range(R)]
        bwd = [((j + 1) % R, j) for j in range(R)]
        parts = []
        if pad_l:
            left = jax.lax.ppermute(x[:, -pad_l:], axis, fwd)
            parts.append(jnp.where(me == 0, jnp.zeros_like(left), left))
        parts.append(x)
        if pad_r:
            right = jax.lax.ppermute(x[:, :pad_r], axis, bwd)
            parts.append(jnp.where(me == R - 1, jnp.zeros_like(right),
                                   right))
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
        return self._layer(x, i)  # one remat-unit definition for both paths

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if x.ndim == 2:
            x = x[..., None]  # (B, T, 1)
        x = x.astype(self.dtype)
        if self.cp_axis is not None:
            return self._cp_forward(x)
        if cfg.use_pallas:
            if (cfg.padding != "SAME" or cfg.norm != "none"
                    or cfg.activation != "relu"):
                raise ValueError(
                    "fused Pallas encoder supports SAME padding, no norm, "
                    "relu only; disable encoder.use_pallas for this config")
            from cpc_tpu.ops.conv_pallas import fused_conv_encoder
            weights, biases = [], []
            for conv in self.convs:
                w, b = conv()
                weights.append(w.astype(self.dtype))
                biases.append(b.astype(self.dtype))
            interpret = jax.default_backend() != "tpu"
            return fused_conv_encoder(
                x[..., 0], tuple(weights), tuple(biases),
                tuple(cfg.kernels), tuple(cfg.strides),
                cfg.pallas_time_tile, interpret)
        layer = (nn.remat(ConvEncoder._layer, static_argnums=(2,))
                 if cfg.remat else ConvEncoder._layer)
        for i in range(len(self.convs)):
            x = layer(self, x, i)
        return x

    def _cp_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if cfg.padding != "SAME" or cfg.use_pallas:
            raise ValueError(
                "CP encoder requires padding='SAME' and use_pallas=False "
                f"(got padding={cfg.padding!r}, use_pallas={cfg.use_pallas})")
        stride_prod = 1
        for s in cfg.strides:
            stride_prod *= s
        if x.shape[1] % stride_prod:
            raise ValueError(
                f"CP encoder: local T {x.shape[1]} must divide by "
                f"prod(strides)={stride_prod}")
        layer = (nn.remat(ConvEncoder._cp_layer, static_argnums=(2,))
                 if cfg.remat else ConvEncoder._cp_layer)
        for i in range(len(self.convs)):
            x = layer(self, x, i)
        return x


class ScalogramEncoder(nn.Module):
    """Music-audio variant (SURVEY.md §3 "Scalogram encoder", BASELINE.json:8).

    Computes a log-magnitude mel/CQT-like scalogram ON DEVICE (rFFT + filterbank
    matmul — no host DSP), then a strided 2-D conv stack over (time, freq)
    collapsing the frequency axis into d_enc channels.

    Input waveform (B, T) -> scalogram (B, frames, n_bins) -> z (B, T', d_enc).
    """

    config: EncoderConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        convs, norms = [], []
        for i, (ch, k, fs, ts) in enumerate(
            zip(cfg.scalogram_channels, cfg.scalogram_kernels,
                cfg.scalogram_freq_strides, cfg.scalogram_time_strides)
        ):
            convs.append(nn.Conv(
                features=ch,
                kernel_size=k,
                strides=(ts, fs),  # (time, freq)
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv2d_{i}",
            ))
            norms.append(_norm_layer(cfg.norm, i, ch, self.dtype,
                                     self.param_dtype))
        self.convs = convs
        self.norms = norms
        self.proj = nn.Dense(cfg.d_enc, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj")

    def _layer(self, h: jnp.ndarray, i: int) -> jnp.ndarray:
        """One (conv2d, norm, act) block — the remat unit (see ConvEncoder;
        the on-device scalogram DSP stays OUTSIDE the remat regions, so the
        rFFT is never recomputed)."""
        h = self.convs[i](h)
        if self.norms[i] is not None:
            h = self.norms[i](h)
        return _activation(self.config.activation)(h)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cpc_tpu.ops.scalogram import scalogram  # on-device DSP

        cfg = self.config
        if x.ndim == 3:
            x = x[..., 0]
        s = scalogram(
            x.astype(jnp.float32),  # DSP in fp32 for numerical sanity
            n_fft=cfg.scalogram_n_fft,
            hop=cfg.scalogram_hop,
            n_bins=cfg.scalogram_n_bins,
            fmin=cfg.scalogram_fmin,
            fmax=cfg.scalogram_fmax,
            scale=cfg.scalogram_scale,
            sample_rate=16_000,
        )  # (B, frames, n_bins)
        h = s[..., None].astype(self.dtype)  # (B, time, freq, 1) as NHWC
        layer = (nn.remat(ScalogramEncoder._layer, static_argnums=(2,))
                 if cfg.remat else ScalogramEncoder._layer)
        for i in range(len(self.convs)):
            h = layer(self, h, i)
        # collapse remaining frequency axis -> (B, time, freq'*ch) -> d_enc
        b, t, f, c = h.shape
        h = h.reshape(b, t, f * c)
        return self.proj(h)


def make_encoder(config: EncoderConfig, dtype, param_dtype) -> nn.Module:
    if config.kind == "conv1d":
        return ConvEncoder(config, dtype=dtype, param_dtype=param_dtype)
    if config.kind == "scalogram":
        return ScalogramEncoder(config, dtype=dtype, param_dtype=param_dtype)
    raise ValueError(f"unknown encoder kind {config.kind!r}")
