"""Feature extraction (SURVEY.md §4.5): run the frozen encoder/gar over long
audio in sliding windows and return (z, c) trajectories.

This is the Immersions-style consumer API: z and c exposed standalone,
outside the loss (SURVEY.md §1 [B:5]).

Overlapping windows (hop < window) stitch a single continuous trajectory:
every window contributes the latents of its final `hop` samples (the first
window contributes everything), so each latent appears exactly once and the
gar context entering each kept segment is warmed by the `window - hop`
overlap. Two caveats inherent to windowing, documented rather than hidden:
latents within the conv stack's receptive field (~465 samples ≈ 3 latents)
of a window's right edge see the window boundary instead of the true future
samples, and c is conditioned on at most `window` samples of history rather
than the full stream.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.dsp import prepare_waveform


def jitted_forward(model: CPCModel, normalize: bool):
    """The cached jitted (params, int16/float batch) -> CPCOutput forward.

    jax.jit caches executables ON THE WRAPPER, so a fresh jit(lambda) per
    call starts with an empty cache and recompiles the whole encoder+gar
    every invocation — minutes per redundant compile on the remote-compile
    TPU host. Key by (model, normalize): flax modules are frozen
    dataclasses over the (hashable) frozen config, so equal configs share
    one executable across every probe/extract call in the process."""
    key = (model, bool(normalize))
    fwd = _FORWARD_CACHE.get(key)
    if fwd is None:
        fwd = jax.jit(lambda p, a: model.apply(
            p, prepare_waveform(a, normalize=normalize)))
        if len(_FORWARD_CACHE) >= 8:
            _FORWARD_CACHE.pop(next(iter(_FORWARD_CACHE)))
        _FORWARD_CACHE[key] = fwd
    return fwd


_FORWARD_CACHE: dict = {}


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
    distribution. With hop < window, consecutive windows overlap and only
    the non-overlapping suffix of each window's latents is kept (see module
    docstring for the stitching contract).
    """
    hop = window if hop is None else hop
    if not 0 < hop <= window:
        raise ValueError(f"need 0 < hop <= window, got hop={hop}")
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

    fwd = jitted_forward(model, normalize)
    zs, cs = [], []
    for i in range(0, len(wins), batch_windows):
        out = fwd(params, jnp.asarray(wins[i:i + batch_windows]))
        zs.append(np.asarray(out.z, np.float32))
        cs.append(np.asarray(out.c, np.float32))
    z_w = np.concatenate(zs)[:n_win]  # (n_win, T_lat, d_enc)
    c_w = np.concatenate(cs)[:n_win]
    t_lat = z_w.shape[1]
    ds = window // t_lat  # samples per latent (160x contract)

    if hop == window:
        z = z_w.reshape(-1, z_w.shape[-1])
        c = c_w.reshape(-1, c_w.shape[-1])
    else:
        if hop % ds or window % ds:
            raise ValueError(
                f"hop and window must be multiples of the {ds}x downsample "
                f"factor for seamless stitching (got hop={hop}, "
                f"window={window})")
        keep = hop // ds          # latents each overlapped window contributes
        lead = t_lat - keep       # warm-context latents to drop
        z = np.concatenate([z_w[0], z_w[1:, lead:].reshape(-1, z_w.shape[-1])])
        c = np.concatenate([c_w[0], c_w[1:, lead:].reshape(-1, c_w.shape[-1])])

    # trim latents that came from the zero-padded tail
    n_valid = T // ds
    return z[:n_valid], c[:n_valid]
