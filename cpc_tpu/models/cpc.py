"""CPC wrapper model: encoder (genc) + context network (gar) + K prediction
heads W_k.

Reference capability (SURVEY.md §3 "CPC wrapper model", §A [B:5]): the public
API is `model(x) -> z, c` plus K bilinear prediction heads; z and c must be
exposed standalone (feature extraction, SURVEY.md §4.5), not only inside the
loss.

The K heads are fused into ONE Dense d_ar -> K*d_enc (a single MXU matmul)
and reshaped to (B, T, K, d_enc) — mathematically identical to K separate
W_k matrices.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from cpc_tpu.config import ModelConfig
from cpc_tpu.models.encoder import make_encoder
from cpc_tpu.models.gru import GRU
from cpc_tpu.models.transformer import CausalTransformer


@struct.dataclass
class CPCOutput:
    z: jnp.ndarray      # (B, T, d_enc) encoder latents
    c: jnp.ndarray      # (B, T, d_ar) autoregressive context
    preds: jnp.ndarray  # (B, T, K, d_enc) k-step predictions W_k c_t


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]


class CPCModel(nn.Module):
    config: ModelConfig

    def setup(self):
        dtype = _dtype(self.config.dtype)
        param_dtype = _dtype(self.config.param_dtype)
        self.encoder = make_encoder(self.config.encoder, dtype, param_dtype)
        if self.config.ar.kind == "gru":
            if self.config.ar.remat:
                raise ValueError(
                    "ar.remat requires the transformer gar: the GRU's scan "
                    "recurrence keeps its per-step carries for the backward "
                    "pass either way, so remat would be a silent no-op "
                    "(encoder.remat is the memory lever for GRU configs)")
            self.gar = GRU(
                hidden_size=self.config.ar.d_ar,
                num_layers=self.config.ar.num_layers,
                dtype=dtype,
                param_dtype=param_dtype,
                use_pallas=self.config.ar.use_pallas,
            )
        elif self.config.ar.kind == "transformer":
            self.gar = CausalTransformer(self.config.ar, dtype=dtype,
                                         param_dtype=param_dtype)
        else:
            raise ValueError(f"unknown ar kind {self.config.ar.kind!r}")
        self.heads = nn.Dense(
            self.config.loss.prediction_steps * self.config.encoder.d_enc,
            use_bias=False,  # bilinear W_k c_t, no bias (SURVEY.md §A)
            dtype=dtype,
            param_dtype=param_dtype,
            name="prediction_heads",
        )

    def _gar(self, z: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.config.ar.kind == "transformer":
            # dropout is live only when train=True (needs a 'dropout' rng)
            return self.gar(z, deterministic=not train)
        return self.gar(z)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> CPCOutput:
        """x: waveform (B, T_samples) or (B, T_samples, 1)."""
        z = self.encoder(x)          # (B, T, d_enc)
        c = self._gar(z, train)      # (B, T, d_ar)
        B, T, _ = c.shape
        K = self.config.loss.prediction_steps
        preds = self.heads(c).reshape(B, T, K, self.config.encoder.d_enc)
        return CPCOutput(z=z, c=c, preds=preds)

    def latents(self, x: jnp.ndarray, train: bool = False):
        """(z, c) without the prediction heads — the input to the fused
        heads+InfoNCE loss (cpc_tpu.ops.infonce_fused), which applies the
        heads weight itself."""
        z = self.encoder(x)
        return z, self._gar(z, train)

    def latents_tm(self, x: jnp.ndarray, train: bool = False):
        """(z (B, T, D), c_tm (T, B, d_ar)) — c in the TIME-MAJOR layout the
        fused heads+InfoNCE kernel consumes. For the GRU gar this is the
        recurrence's native output layout, so the model-out/loss-in
        transpose pair cancels entirely; the transformer keeps its (B, T, A)
        internals and transposes once here (same cost as before)."""
        z = self.encoder(x)
        if self.config.ar.kind == "gru":
            return z, self.gar(z, time_major_out=True)
        return z, self._gar(z, train).transpose(1, 0, 2)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Standalone latents z (feature-extraction API, SURVEY.md §4.5)."""
        return self.encoder(x)

    def context_from_z(self, z: jnp.ndarray,
                       train: bool = False) -> jnp.ndarray:
        """c from precomputed latents — the gar alone. Used by the
        context-parallel composition (parallel/cp.py), where z arrives
        already T-sharded inside shard_map."""
        return self._gar(z, train)

    def predict(self, c: jnp.ndarray) -> jnp.ndarray:
        """K-step predictions from context: (B, T, K*d_enc), the fused
        heads matmul un-reshaped (per-position — CP-safe)."""
        return self.heads(c)

    def context(self, x: jnp.ndarray) -> jnp.ndarray:
        """Standalone context c (feature-extraction API, SURVEY.md §4.5)."""
        return self._gar(self.encoder(x), train=False)

    def context_with_state(self, z: jnp.ndarray, h0=None):
        """(c, final GRU hidden (num_layers, B, H)) from latents z — the
        state-carry hook for constant-memory streaming extraction
        (cpc_tpu.eval.streaming). GRU gar only: a causal transformer has no
        constant-size recurrent state to carry."""
        if self.config.ar.kind != "gru":
            raise ValueError(
                "context_with_state requires the GRU gar; the transformer "
                "variant has no constant-size carry (use windowed "
                "extract_features instead)")
        return self.gar(z, h0=h0, return_state=True)
