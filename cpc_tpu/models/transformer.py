"""gar variant: causal transformer context network (SURVEY.md §3
"Transformer gar variant", BASELINE.json:9).

Pre-LN causal self-attention blocks with a learned positional embedding.
Sequence lengths in this workload are snippet-bounded (~128 latents,
SURVEY.md §6.7), so plain O(T^2) attention is MXU-friendly and nowhere near
memory limits; the causal mask is applied as an additive -inf bias inside a
single fused softmax.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cpc_tpu.config import ArConfig


class _Block(nn.Module):
    d_model: int
    num_heads: int
    mlp_ratio: int
    dropout: float
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
        )(h, h, mask=mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.Dense(self.d_model * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class CausalTransformer(nn.Module):
    """z (B, T, D) -> c (B, T, d_ar); strictly causal (c_t sees z_<=t)."""

    config: ArConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, T, _ = z.shape
        if T > cfg.max_len:
            raise ValueError(f"sequence length {T} > max_len {cfg.max_len}")
        x = nn.Dense(cfg.d_ar, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="in_proj")(z.astype(self.dtype))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (cfg.max_len, cfg.d_ar),
            self.param_dtype,
        )
        x = x + pos[:T].astype(self.dtype)[None]
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        mask = nn.make_causal_mask(jnp.ones((B, T)), dtype=bool)
        for i in range(cfg.num_layers):
            x = _Block(
                d_model=cfg.d_ar,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                dropout=cfg.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block{i}",
            )(x, mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="final_norm")(x)
        return x
