"""gar variant: causal transformer context network (SURVEY.md §3
"Transformer gar variant", BASELINE.json:9).

Pre-LN causal self-attention blocks with a learned positional embedding.
Sequence lengths in this workload are snippet-bounded (~128 latents,
SURVEY.md §6.7), so plain O(T^2) attention is MXU-friendly and nowhere near
memory limits; the causal mask is applied as an additive -inf bias inside a
single fused softmax.

Streaming (SURVEY.md §4.5): with `decode=True` the same parameter tree runs
an incremental KV-cache path — `extend()` consumes ONE new latent, attends
over the cached keys/values of everything already seen (flax's MHA decode
cache), and emits that position's context exactly as the offline forward
would. cpc_tpu.eval.streaming scans extend() over each pushed chunk.

Module layout note: submodules are declared in setup() with the names flax's
nn.compact auto-numbering used to generate (LayerNorm_0,
MultiHeadDotProductAttention_0, ...) so existing checkpoints and golden
fixtures load unchanged; setup-style is required for __call__ and extend()
to share parameters.

Long context (ar.attn_impl='flash'): at the context-scaling study's snippet
lengths (T >= 1024, RESULTS.md runs 4-5) XLA's attention materializes
B*H*T^2 scores per layer; `ops/attention_pallas.py` streams them flash-style
instead. FlashSelfAttention carries the exact flax-MHA parameter tree
(query/key/value/out DenseGenerals under the same module name), so the same
checkpoint loads under either impl — and the decode/KV-cache twin keeps the
flax path regardless (one new latent per step has no score matrix to fuse).

Context parallelism (ar.attn_impl='ring', or 'zigzag' for the
load-balanced schedule that computes only the causal half of the score
tiles — ops/attention_zigzag.py): past flash, the wall is the
(B, T, D) activations themselves. Every op in this module except attention
is per-position, so apply the module under shard_map with z sharded along T
on the `ar.cp_axis` mesh axis and attention running the KV ppermute ring
(`ops/attention_ring.py`); the positional embedding is offset by the
shard's global position. Same flax param tree again — params replicated,
activations T-sharded. See parallel/cp.py for the shard_map wrapper.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpc_tpu.config import ArConfig


class FlashSelfAttention(nn.Module):
    """Drop-in causal self-attention over the Pallas flash kernel.

    Parameter tree is identical to flax's MultiHeadDotProductAttention
    (query/key/value DenseGenerals with (H, Dh) features + the merged 'out'
    projection), so checkpoints move freely between attn_impl settings.
    Causality comes from the kernel itself — no mask tensor is ever built.
    """

    num_heads: int
    d_model: int
    dtype: Any
    param_dtype: Any
    p_dtype: str = "float32"  # post-softmax matmul input dtype ('flash16')

    def setup(self):
        if self.d_model % self.num_heads:
            raise ValueError(f"d_ar {self.d_model} not divisible by "
                             f"num_heads {self.num_heads}")
        head_dim = self.d_model // self.num_heads
        dg = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.query = nn.DenseGeneral((self.num_heads, head_dim),
                                     name="query", **dg)
        self.key = nn.DenseGeneral((self.num_heads, head_dim),
                                   name="key", **dg)
        self.value = nn.DenseGeneral((self.num_heads, head_dim),
                                     name="value", **dg)
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1),
                                   name="out", **dg)

    def __call__(self, inputs_q, inputs_kv=None, mask=None,
                 deterministic: bool = True):
        from cpc_tpu.ops.attention_pallas import flash_causal_mha
        if inputs_kv is None:
            inputs_kv = inputs_q
        q = self.query(inputs_q)   # (B, T, H, Dh)
        k = self.key(inputs_kv)
        v = self.value(inputs_kv)
        return self.out(flash_causal_mha(q, k, v, p_dtype=self.p_dtype))


class RingSelfAttention(FlashSelfAttention):
    """Context-parallel causal self-attention (ops/attention_ring.py).

    Inherits FlashSelfAttention's setup() — the SAME flax-MHA parameter
    tree, kept identical in one place. Inputs/outputs are this device's
    (B, T_loc, d) shard of a T-sharded sequence — must run inside
    shard_map with `cp_axis` a mesh axis name.
    """

    cp_axis: str = "ctx"
    zigzag: bool = False  # balanced schedule (ops/attention_zigzag.py):
    # same contiguous-shard contract, half the score FLOPs

    def __call__(self, inputs_q, inputs_kv=None, mask=None,
                 deterministic: bool = True):
        from cpc_tpu.ops.attention_ring import ring_causal_mha
        from cpc_tpu.ops.attention_zigzag import zigzag_causal_mha
        if inputs_kv is None:
            inputs_kv = inputs_q
        q = self.query(inputs_q)   # (B, T_loc, H, Dh)
        k = self.key(inputs_kv)
        v = self.value(inputs_kv)
        mha = zigzag_causal_mha if self.zigzag else ring_causal_mha
        return self.out(mha(q, k, v, axis_name=self.cp_axis))


class _Block(nn.Module):
    d_model: int
    num_heads: int
    mlp_ratio: int
    dropout: float
    dtype: Any
    param_dtype: Any
    decode: bool = False
    attn_impl: str = "xla"
    cp_axis: str = "ctx"

    def setup(self):
        self.ln_attn = nn.LayerNorm(dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="LayerNorm_0")
        if self.attn_impl in ("ring", "zigzag") and not self.decode:
            self.attn = RingSelfAttention(
                num_heads=self.num_heads,
                d_model=self.d_model,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                cp_axis=self.cp_axis,
                zigzag=self.attn_impl == "zigzag",
                name="MultiHeadDotProductAttention_0",
            )
        elif self.attn_impl in ("flash", "flash16") and not self.decode:
            self.attn = FlashSelfAttention(
                num_heads=self.num_heads,
                d_model=self.d_model,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                p_dtype=("bfloat16" if self.attn_impl == "flash16"
                         else "float32"),
                name="MultiHeadDotProductAttention_0",
            )
        else:
            self.attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                dropout_rate=self.dropout,
                decode=self.decode,
                name="MultiHeadDotProductAttention_0",
            )
        self.drop = nn.Dropout(self.dropout)
        self.ln_mlp = nn.LayerNorm(dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="LayerNorm_1")
        self.fc1 = nn.Dense(self.d_model * self.mlp_ratio, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="Dense_0")
        self.fc2 = nn.Dense(self.d_model, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="Dense_1")

    def __call__(self, x: jnp.ndarray, mask,
                 deterministic: bool = True) -> jnp.ndarray:
        h = self.ln_attn(x)
        h = self.attn(h, h, mask=mask, deterministic=deterministic)
        h = self.drop(h, deterministic=deterministic)
        x = x + h
        h = self.ln_mlp(x)
        h = self.fc2(nn.gelu(self.fc1(h)))
        h = self.drop(h, deterministic=deterministic)
        return x + h


class CausalTransformer(nn.Module):
    """z (B, T, D) -> c (B, T, d_ar); strictly causal (c_t sees z_<=t)."""

    config: ArConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    decode: bool = False  # KV-cache incremental mode (streaming consumer)

    def setup(self):
        cfg = self.config
        if cfg.attn_impl not in ("xla", "flash", "flash16", "ring",
                                 "zigzag"):
            raise ValueError(
                f"ar.attn_impl must be 'xla'|'flash'|'flash16'|'ring'|"
                f"'zigzag', got {cfg.attn_impl!r}")
        if cfg.attn_impl != "xla" and cfg.dropout > 0:
            raise ValueError(
                f"ar.attn_impl={cfg.attn_impl!r} does not implement "
                "attention-weight dropout (flax's MHA semantics); use "
                "attn_impl='xla' with dropout, or dropout=0.0 with flash")
        if cfg.attn_impl in ("ring", "zigzag") and self.decode:
            raise ValueError(
                f"ar.attn_impl={cfg.attn_impl!r} has no KV-cache decode "
                "twin — stream via attn_impl='xla' (eval.streaming pins it "
                "anyway)")
        self.in_proj = nn.Dense(cfg.d_ar, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="in_proj")
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.max_len, cfg.d_ar), self.param_dtype)
        self.in_drop = nn.Dropout(cfg.dropout)
        self.blocks = [
            _Block(
                d_model=cfg.d_ar,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                dropout=cfg.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                decode=self.decode,
                attn_impl=cfg.attn_impl,
                cp_axis=cfg.cp_axis,
                name=f"block{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="final_norm")
        if self.decode:
            # position counter for extend(); variables must be created in
            # setup for setup-style modules
            self._pos = self.variable("cache", "pos_index",
                                      lambda: jnp.zeros((), jnp.int32))

    def __call__(self, z: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, T, _ = z.shape
        if cfg.attn_impl in ("ring", "zigzag"):
            # z is this device's T-shard; positions are globally offset
            try:
                R = jax.lax.axis_size(cfg.cp_axis)
            except (NameError, KeyError, TypeError) as e:
                raise ValueError(
                    f"ar.attn_impl={cfg.attn_impl!r} must be applied inside "
                    f"shard_map with mesh axis {cfg.cp_axis!r} (z sharded "
                    f"along T) — use cpc_tpu.parallel.cp."
                    f"cp_transformer_apply; plain apply has no "
                    f"{cfg.cp_axis!r} axis ({e})") from e
            if R * T > cfg.max_len:
                raise ValueError(f"global sequence {R}*{T} > max_len "
                                 f"{cfg.max_len}")
            start = jax.lax.axis_index(cfg.cp_axis) * T
            pos = jax.lax.dynamic_slice_in_dim(self.pos_embed, start, T)
        else:
            if T > cfg.max_len:
                raise ValueError(f"sequence length {T} > max_len "
                                 f"{cfg.max_len}")
            pos = self.pos_embed[:T]
        x = self.in_proj(z.astype(self.dtype))
        x = x + pos.astype(self.dtype)[None]
        x = self.in_drop(x, deterministic=deterministic)
        # flash/ring are causal in-kernel; no (B, 1, T, T) mask tensor
        mask = (None if cfg.attn_impl in ("flash", "flash16", "ring",
                                          "zigzag")
                else nn.make_causal_mask(jnp.ones((B, T)), dtype=bool))
        # ar.remat: checkpoint each block — only the (B, T, d_ar) residual
        # stream stays live across the forward; attention/MLP internals are
        # recomputed during backprop (ring ppermutes replay in the recompute)
        blk_fn = (nn.remat(_Block.__call__, static_argnums=(3,))
                  if cfg.remat else _Block.__call__)
        for blk in self.blocks:
            x = blk_fn(blk, x, mask, deterministic)
        return self.final_norm(x)

    def extend(self, z_t: jnp.ndarray) -> jnp.ndarray:
        """One incremental step: z_t (B, 1, D) -> c_t (B, 1, d_ar), attending
        over the KV cache of all previously extended positions. Requires a
        decode=True module whose 'cache' collection was created by an init
        at full max_len length (see eval.streaming); apply with
        mutable=['cache']. Exactly equals column t of the offline forward.

        CONTRACT: the caller must bound extend() calls by cfg.max_len —
        the position index is a traced cache variable, so past the table
        the slice/update indices CLAMP (the last positional row is reused
        and the final KV slot overwritten) rather than raise; this is
        silent corruption, not an error. eval.streaming enforces the bound
        (StreamingExtractor raises 'stream exceeds the transformer's
        positional table'); direct users must do the same."""
        if not self.decode:
            raise ValueError("extend() requires decode=True (KV cache)")
        pos = self._pos
        i = pos.value
        x = self.in_proj(z_t.astype(self.dtype))
        p = jax.lax.dynamic_slice_in_dim(self.pos_embed, i, 1, axis=0)
        x = x + p.astype(self.dtype)[None]
        for blk in self.blocks:
            # flax's decode-mode MHA inserts this step's K/V at its own
            # cache_index and masks attention to positions <= it
            x = blk(x, mask=None, deterministic=True)
        if not self.is_initializing():
            pos.value = i + 1
        return self.final_norm(x)
