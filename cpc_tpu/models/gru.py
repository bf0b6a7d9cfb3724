"""gar: GRU context network as a lax.scan-fused recurrence.

Reference capability (SURVEY.md §3 "GRU context net gar", §A): 1-layer GRU,
d_ar=256, over z -> context c. The reference rides cuDNN's fused GRU; the
TPU-native equivalent below gets its throughput from:

  * ONE big input projection for the whole sequence outside the scan —
    (B*T, D) x (D, 3H) hits the MXU once instead of T times;
  * inside the scan only the recurrent half: (B, H) x (H, 3H) per step with
    all three gates fused in a single matmul;
  * gate math matches torch.nn.GRU exactly (r/z gates, candidate n uses
    r * (W_hn h + b_hn)) so fp32 parity with the reference semantics holds.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRU(nn.Module):
    """Multi-layer unidirectional GRU. Input (B, T, D) -> (B, T, H).

    use_pallas routes the recurrence through the single-pallas_call scan
    kernel (cpc_tpu.ops.gru_pallas) instead of lax.scan — same math, far
    lower per-step dispatch cost on TPU."""

    hidden_size: int
    num_layers: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
        return_state: bool = False, time_major_out: bool = False,
    ):
        """h0/state layout: (num_layers, B, H). With return_state, returns
        (output, final_state) — feeding final_state back as h0 continues the
        recurrence exactly (the streaming consumer, SURVEY.md §4.5).

        time_major_out returns (T, B, H) — the recurrence's NATIVE layout
        (the scan emits time-major; the (B, T, H) default is a transpose).
        The fused heads+InfoNCE loss consumes time-major directly, so the
        transpose pair model-out/loss-in cancels (VERDICT r2 next #1a)."""
        h = x.astype(self.dtype)
        finals = []
        for layer in range(self.num_layers):
            last = layer == self.num_layers - 1
            h = _GRULayer(
                hidden_size=self.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                name=f"layer{layer}",
            )(h, None if h0 is None else h0[layer],
              time_major_out=time_major_out and last)
            if return_state:
                finals.append(h[-1] if (time_major_out and last)
                              else h[:, -1])
        if return_state:
            return h, jnp.stack(finals)
        return h


class _GRULayer(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
        time_major_out: bool = False,
    ) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden_size

        wi = self.param("wi", nn.initializers.lecun_normal(), (D, 3 * H),
                        self.param_dtype)
        bi = self.param("bi", nn.initializers.zeros, (3 * H,), self.param_dtype)
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H),
                        self.param_dtype)
        bh = self.param("bh", nn.initializers.zeros, (3 * H,), self.param_dtype)

        x = x.astype(self.dtype)
        wi = wi.astype(self.dtype)
        wh = wh.astype(self.dtype)
        bi = bi.astype(self.dtype)
        bh = bh.astype(self.dtype)

        # One MXU-sized matmul for all timesteps' input projections.
        xproj = x.reshape(B * T, D) @ wi + bi  # (B*T, 3H)
        xproj = xproj.reshape(B, T, 3 * H).transpose(1, 0, 2)  # (T, B, 3H)

        if h0 is None:
            h0 = jnp.zeros((B, H), self.dtype)

        if self.use_pallas:
            from cpc_tpu.ops.gru_pallas import (MEASURED_B_ENVELOPE,
                                                MEASURED_H_ENVELOPE,
                                                gru_scan)
            if B > MEASURED_B_ENVELOPE or H > MEASURED_H_ENVELOPE:
                import warnings
                warnings.warn(
                    f"ar.use_pallas: (batch {B}, hidden {H}) exceeds the "
                    f"GRU kernel's measured compile envelope "
                    f"(B<={MEASURED_B_ENVELOPE}, H<={MEASURED_H_ENVELOPE} "
                    f"on v5e); using the lax.scan recurrence (same math)",
                    stacklevel=2)
            else:
                interpret = jax.default_backend() != "tpu"
                hs = gru_scan(xproj, wh, bh, h0.astype(jnp.float32),
                              interpret)
                hs = hs.astype(self.dtype)
                return hs if time_major_out else hs.transpose(1, 0, 2)

        def step(h, xp):
            # torch.nn.GRU gate order: r, z, n
            hproj = h @ wh + bh  # (B, 3H) — single fused recurrent matmul
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hproj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        _, hs = jax.lax.scan(step, h0, xproj)  # (T, B, H)
        return hs if time_major_out else hs.transpose(1, 0, 2)  # (B, T, H)


def gru_reference_loop(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Hand-rolled per-step Python loop with identical math — the §5.1 test
    oracle for the scan fusion. Single layer, params from `_GRULayer`."""
    wi, bi, wh, bh = (params[k] for k in ("wi", "bi", "wh", "bh"))
    B, T, D = x.shape
    H = wh.shape[0]
    h = jnp.zeros((B, H), x.dtype)
    out = []
    for t in range(T):
        xp = x[:, t] @ wi + bi
        hp = h @ wh + bh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        out.append(h)
    return jnp.stack(out, axis=1)
