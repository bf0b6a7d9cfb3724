"""Feature extraction (SURVEY.md §4.5): run the frozen encoder/gar over long
audio in sliding windows and return (z, c) trajectories.

This is the Immersions-style consumer API: z and c exposed standalone,
outside the loss (SURVEY.md §1 [B:5])."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.dsp import prepare_waveform


def extract_features(
    model: CPCModel,
    params,
    waveform: np.ndarray,
    *,
    window: int = 20_480,
    hop: Optional[int] = None,
    batch_windows: int = 32,
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """waveform (T,) float32 -> (z (N, d_enc), c (N, d_ar)) trajectories.

    Windows are jitted in fixed-size batches so one compilation serves any
    stream length; the tail window is zero-padded and trimmed. Each window
    goes through the same prepare_waveform (dequant + per-window
    normalization) the training step applies, matching the trained input
    distribution.
    """
    hop = hop or window
    if hop != window:
        raise NotImplementedError(
            "overlapping windows would double-count latents in the "
            "concatenated trajectory; use hop == window")
    T = len(waveform)
    n_win = max(1, 1 + (max(T - window, 0) + hop - 1) // hop)
    pad_len = (n_win - 1) * hop + window
    x = np.zeros(pad_len, dtype=np.float32)
    x[:T] = waveform
    starts = np.arange(n_win) * hop
    wins = np.stack([x[s:s + window] for s in starts])  # (n_win, window)

    # pad the window count to a multiple of batch_windows for a single jit
    n_pad = (-n_win) % batch_windows
    if n_pad:
        wins = np.concatenate([wins, np.zeros((n_pad, window), np.float32)])

    fwd = jax.jit(
        lambda p, a: model.apply(p, prepare_waveform(a, normalize=normalize)))
    zs, cs = [], []
    for i in range(0, len(wins), batch_windows):
        out = fwd(params, jnp.asarray(wins[i:i + batch_windows]))
        zs.append(np.asarray(out.z, np.float32))
        cs.append(np.asarray(out.c, np.float32))
    z = np.concatenate(zs)[:n_win].reshape(-1, zs[0].shape[-1])
    c = np.concatenate(cs)[:n_win].reshape(-1, cs[0].shape[-1])
    # trim latents that came from the zero-padded tail
    ds = window // zs[0].shape[1]  # samples per latent (160x contract)
    n_valid = T // ds
    return z[:n_valid], c[:n_valid]
