"""gar variant: causal transformer context network (SURVEY.md §3
"Transformer gar variant", BASELINE.json:9).

Pre-LN causal self-attention blocks with a learned positional embedding.
Sequence lengths in this workload are snippet-bounded (~128 latents,
SURVEY.md §6.7), so plain O(T^2) attention is MXU-friendly and nowhere near
memory limits; the causal mask is applied as an additive -inf bias inside a
single fused softmax.

Streaming (SURVEY.md §4.5): `decode_step()` is the incremental KV-cache
path — it consumes ONE new latent per stream, attends over the cached
keys/values of everything already seen, and emits that position's context
exactly as the offline forward would. The cache is an EXPLICIT fixed-shape
carry (`decode_carry()`: stacked per-layer K/V buffers + a PER-STREAM
position vector), not a flax variable collection: that makes the step a
pure jittable (carry, z_t) -> (c_t, carry') function — exportable as a
StableHLO artifact (cpc_tpu.export.export_streaming_step) — and gives each
batch row its own position, so one serving stream can reset/restart
without disturbing the others (StreamingExtractor.reset_stream). The
earlier flax decode-cache formulation (mutable 'cache' collection, one
shared scalar index) could do neither. cpc_tpu.eval.streaming scans
decode_step over each pushed chunk.

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

    def decode(self, h, k_cache, v_cache, pos):
        """One KV-cache attention step with per-row positions (pure jnp —
        no Pallas, no flax cache variables; the streaming/export path).

        h (B, 1, d) is this step's (already-LayerNormed) token per stream;
        k_cache/v_cache (B, S, H, Dh) hold each stream's keys/values;
        pos (B,) int32 is where row b's NEW key/value lands — attention
        then covers indices <= pos[b], so stale entries beyond a reset
        row's position are never read. Mirrors flax MHA numerics exactly
        (q/sqrt(Dh) scaling, finfo-min mask bias, same-dtype softmax).
        Returns (out (B, 1, d), k_cache', v_cache')."""
        q = self.query(h)            # (B, 1, H, Dh)
        k_new = self.key(h)[:, 0]    # (B, H, Dh)
        v_new = self.value(h)[:, 0]

        def put(cache, new, p):
            return jax.lax.dynamic_update_slice_in_dim(cache, new[None],
                                                       p, axis=0)

        k_cache = jax.vmap(put)(k_cache, k_new, pos)
        v_cache = jax.vmap(put)(v_cache, v_new, pos)
        dh = q.shape[-1]
        scores = jnp.einsum("bqhd,bshd->bhqs",
                            q / jnp.sqrt(dh).astype(q.dtype), k_cache)
        valid = jnp.arange(k_cache.shape[1])[None, :] <= pos[:, None]
        scores = jnp.where(valid[:, None, None, :], scores,
                           jnp.finfo(scores.dtype).min)
        w = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqs,bshd->bqhd", w, v_cache)
        return self.out(o), k_cache, v_cache


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
    attn_impl: str = "xla"
    cp_axis: str = "ctx"

    def setup(self):
        self.ln_attn = nn.LayerNorm(dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="LayerNorm_0")
        if self.attn_impl in ("ring", "zigzag"):
            self.attn = RingSelfAttention(
                num_heads=self.num_heads,
                d_model=self.d_model,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                cp_axis=self.cp_axis,
                zigzag=self.attn_impl == "zigzag",
                name="MultiHeadDotProductAttention_0",
            )
        elif self.attn_impl in ("flash", "flash16"):
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

    def decode_step(self, x, k_cache, v_cache, pos):
        """Incremental twin of __call__ for one token per stream: requires
        the explicit-projection attention modules (attn_impl != 'xla' —
        see carry_decode_model). Returns (x', k_cache', v_cache')."""
        if not isinstance(self.attn, FlashSelfAttention):
            raise ValueError(
                "decode_step needs explicit q/k/v projections; this block "
                "was built with attn_impl='xla' (flax MHA) — wrap the "
                "config via carry_decode_model(), which shares the exact "
                "parameter tree")
        a, k_cache, v_cache = self.attn.decode(self.ln_attn(x),
                                               k_cache, v_cache, pos)
        x = x + a
        x = x + self.fc2(nn.gelu(self.fc1(self.ln_mlp(x))))
        return x, k_cache, v_cache


class CausalTransformer(nn.Module):
    """z (B, T, D) -> c (B, T, d_ar); strictly causal (c_t sees z_<=t)."""

    config: ArConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

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
                attn_impl=cfg.attn_impl,
                cp_axis=cfg.cp_axis,
                name=f"block{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="final_norm")

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

    def decode_step(self, z_t: jnp.ndarray, carry: dict):
        """One incremental step with the KV cache as an EXPLICIT carry:
        z_t (B, D_enc) -> (c_t (B, d_ar), carry'). carry is decode_carry()'s
        pytree — stacked per-layer K/V buffers plus a PER-STREAM position
        vector — so the step is a pure jittable function (StableHLO-
        exportable, lax.scan-able over a chunk of latents) and each batch
        row advances/restarts independently. c_t exactly equals column
        pos[b] of the offline forward over that stream's tokens so far.

        CONTRACT: the caller must bound each row's positions by
        cfg.max_len — past the table the per-row slice/update indices
        CLAMP (the last positional row is reused, the final KV slot
        overwritten) rather than raise; this is silent corruption, not an
        error. eval.streaming enforces the bound (StreamingExtractor
        raises 'stream exceeds the transformer's positional table');
        direct users must do the same."""
        k_all, v_all, pos = carry["k"], carry["v"], carry["pos"]
        x = self.in_proj(z_t.astype(self.dtype))[:, None, :]   # (B, 1, d)
        p = jnp.take(self.pos_embed, pos, axis=0)              # (B, d)
        x = x + p.astype(self.dtype)[:, None, :]
        if isinstance(k_all, tuple):
            # fast path (what decode_carry builds): one buffer PER LAYER,
            # so each step only row-scatters the new K/V — no slice out of
            # / dynamic-update back into a stacked (L, ...) array, which
            # XLA:CPU does not elide and costs a full-cache copy per token
            ks, vs = list(k_all), list(v_all)
            for i, blk in enumerate(self.blocks):
                x, ks[i], vs[i] = blk.decode_step(x, ks[i], vs[i], pos)
            new_k, new_v = tuple(ks), tuple(vs)
        else:
            # stacked (L, B, S, H, Dh) arrays — the export/serve WIRE
            # format (kept: a fixed arity of artifact inputs regardless of
            # depth). export_streaming_step converts to the tuple form
            # around its scan so the per-token cost is the same.
            for i, blk in enumerate(self.blocks):
                x, k_i, v_i = blk.decode_step(x, k_all[i], v_all[i], pos)
                k_all = k_all.at[i].set(k_i)
                v_all = v_all.at[i].set(v_i)
            new_k, new_v = k_all, v_all
        c_t = self.final_norm(x)[:, 0]
        return c_t, {"k": new_k, "v": new_v, "pos": pos + 1}


def decode_carry(cfg: ArConfig, n_streams: int) -> dict:
    """Fresh cache-as-carry for decode_step: per-layer K/V buffers as a
    num_layers-TUPLE of (n_streams, max_len, num_heads, head_dim) fp32
    zeros plus per-stream positions (n_streams,) int32 zeros. Per-layer
    buffers (not one stacked array) so each decoded token row-scatters
    into its layer's buffer directly — no slice/update-slice round trip
    through a stacked axis (measured 1.4x on the 64-token streaming scan,
    L=4 B=16 S=1024, XLA:CPU). decode_step also accepts the stacked
    (num_layers, ...) array form — the export/serve wire format.
    Resetting stream b is `carry['pos'].at[b].set(0)` — its stale K/V
    entries are masked off by the position bound, never read."""
    dh = cfg.d_ar // cfg.num_heads
    shape = (n_streams, cfg.max_len, cfg.num_heads, dh)
    return {"k": tuple(jnp.zeros(shape, jnp.float32)
                       for _ in range(cfg.num_layers)),
            "v": tuple(jnp.zeros(shape, jnp.float32)
                       for _ in range(cfg.num_layers)),
            "pos": jnp.zeros((n_streams,), jnp.int32)}


def carry_decode_model(cfg: ArConfig) -> "CausalTransformer":
    """The fp32 decode twin: SAME parameter tree as every attn_impl (the
    explicit q/k/v/out DenseGenerals mirror flax MHA's), built on the
    explicit-projection attention modules decode_step needs. The flash
    __call__ kernel is never traced on the decode path — decode_step is
    pure jnp — so exports stay Mosaic-free and portable."""
    import dataclasses as _dc
    ar = _dc.replace(cfg, attn_impl="flash", dropout=0.0)
    return CausalTransformer(ar, dtype=jnp.float32,
                             param_dtype=jnp.float32)
