"""Frozen-encoder downstream probes (SURVEY.md §4.3, BASELINE.json:11):
speaker-ID and phone classification with a linear classifier on frozen CPC
features.

Protocol (CPC paper §3.1 / reference's eval):
  * features = context c (default; the paper probes c) or latents z,
    mean-pooled per utterance for speaker-ID, per-frame for phones;
  * a single Dense layer trained with softmax-CE, Adam; the CPC model stays
    frozen (stop_gradient is structural: only probe params are optimized);
  * top-1 accuracy on a held-out split.

The probe train loop is one jitted full-batch step over pre-extracted
features — feature extraction is the only model-forward cost.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpc_tpu.data.dataset import ProbeDataset
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.dsp import prepare_waveform


@dataclasses.dataclass
class LinearProbeResult:
    accuracy: float
    num_classes: int
    num_train: int
    num_eval: int
    feature: str


def _extract(model, params, snippets: np.ndarray, feature: str,
             batch: int = 32, normalize: bool = True) -> np.ndarray:
    """snippets (N, S) -> per-frame features (N, T, d), jitted in batches.

    Inputs go through the same prepare_waveform (dequant + per-snippet
    normalization) the training step applies on device, so frozen features
    come from the distribution the model was trained on."""
    from cpc_tpu.eval.features import jitted_forward
    fwd = jitted_forward(model, normalize)
    outs = []
    n_pad = (-len(snippets)) % batch
    padded = np.concatenate(
        [snippets, np.zeros((n_pad,) + snippets.shape[1:], snippets.dtype)])
    for i in range(0, len(padded), batch):
        out = fwd(params, jnp.asarray(padded[i:i + batch]))
        feats = out.c if feature == "c" else out.z
        outs.append(np.asarray(feats, np.float32))
    return np.concatenate(outs)[:len(snippets)]


def _train_linear(
    x_train: np.ndarray, y_train: np.ndarray,
    x_eval: np.ndarray, y_eval: np.ndarray,
    num_classes: int, *, steps: int = 300, lr: float = 1e-2, seed: int = 0,
) -> float:
    """Full-batch Adam on a Dense probe; returns eval top-1 accuracy.
    Features are standardized with train-split statistics."""
    mu = x_train.mean(axis=0, keepdims=True)
    sd = x_train.std(axis=0, keepdims=True) + 1e-6
    x_train = (x_train - mu) / sd
    x_eval = (x_eval - mu) / sd
    d = x_train.shape[-1]
    rng = jax.random.key(seed)
    w = jax.random.normal(rng, (d, num_classes)) * 0.01
    b = jnp.zeros((num_classes,))
    params = {"w": w, "b": b}
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    xt, yt = jnp.asarray(x_train), jnp.asarray(y_train)

    # x/y are jit ARGUMENTS, not closure captures: captured arrays are
    # embedded in the compiled program as constants, and at long-context
    # feature sizes that blows past the remote-compile request limit
    # (HTTP 413 at ~200k x 512 fp32 frames on the axon tunnel)
    @jax.jit
    def step(params, opt_state, xt, yt):
        def loss_fn(p):
            logits = xt @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yt).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(steps):
        params, opt_state = step(params, opt_state, xt, yt)

    logits = np.asarray(jnp.asarray(x_eval) @ params["w"] + params["b"])
    return float((logits.argmax(-1) == y_eval).mean())


def _split(n: int, eval_frac: float, seed: int):
    order = np.random.default_rng(seed).permutation(n)
    n_eval = max(1, int(n * eval_frac))
    return order[n_eval:], order[:n_eval]


def _split_items(n: int, files, split: str, eval_frac: float, seed: int):
    """Train/eval index split over n snippets.

    split='snippet' permutes snippets (snippets of the same source file land
    on BOTH sides — leaks per-recording signatures; see RESULTS.md).
    split='file' holds out whole source files, the honest protocol."""
    if split == "file":
        uniq = sorted(set(files))
        _, ev_f = _split(len(uniq), eval_frac, seed)
        ev_files = {uniq[j] for j in ev_f}
        idx = np.arange(n)
        in_eval = np.asarray([f in ev_files for f in files], bool)
        return idx[~in_eval], idx[in_eval]
    if split == "snippet":
        return _split(n, eval_frac, seed)
    raise ValueError(f"split must be 'snippet'|'file', got {split!r}")


def run_speaker_probe(
    model: CPCModel, params, dataset: ProbeDataset, *,
    feature: str = "c", max_snippets: int = 512, eval_frac: float = 0.25,
    steps: int = 300, seed: int = 0, normalize: bool = True,
    pool: str = "snippet", split: str = "snippet", time_pool: str = "mean",
) -> LinearProbeResult:
    """Time-pooled features -> speaker id (BASELINE.json:11).

    time_pool picks the readout over the snippet's frames (see pool_time:
    mean | last | max).

    pool='snippet' (default) classifies each 1.28 s snippet's mean-pooled
    feature; pool='utterance' averages all of a source file's snippet
    features first — the longer horizon raises the information ceiling when
    speaker identity lives in temporal statistics (the dynamics corpus),
    at the cost of fewer eval items.

    split='snippet' (default) permutes snippets into train/eval, so
    snippets of the SAME source file land on both sides — the probe can
    then exploit per-utterance signatures (recording identity) instead of
    speaker identity. split='file' holds out whole files: eval snippets
    come from utterances the probe never saw, the honest speaker-ID
    protocol (and the only sound one on the dynamics corpus, where every
    utterance has its own f0). pool='utterance' is file-disjoint by
    construction."""
    pooled, y, files = extract_speaker_features(
        model, params, dataset, feature=feature, max_snippets=max_snippets,
        normalize=normalize, time_pool=time_pool)
    return probe_speaker_features(
        pooled, y, files, dataset.num_speakers, eval_frac=eval_frac,
        steps=steps, seed=seed, pool=pool, split=split, feature=feature)


def extract_speaker_frame_features(
    model: CPCModel, params, dataset: ProbeDataset, *,
    feature: str = "c", max_snippets: int = 512, normalize: bool = True,
):
    """One forward sweep -> per-frame (feats (N, T, d), labels (N,),
    source files (N,)). Callers wanting several time poolings (mean AND
    last) pool this once-extracted array instead of sweeping twice."""
    n = min(len(dataset), max_snippets)
    snippets, labels = [], []
    for i in range(n):
        x, spk, _ = dataset.item_with_labels(i)
        snippets.append(x)
        labels.append(spk)
    feats = _extract(model, params, np.stack(snippets), feature,
                     normalize=normalize)
    files = [dataset.locate(i)[0] for i in range(n)]
    return feats, np.asarray(labels), files


def pool_time(feats: np.ndarray, time_pool: str) -> np.ndarray:
    """'mean' averages the trajectory; 'last' reads the final frame (where
    a recurrent gar would accumulate an integrated posterior); 'max' takes
    the per-dimension maximum over time — it keys on the strongest LOCAL
    evidence anywhere in the trajectory, so it separates "evidence is
    distributed but peaky" from "evidence is weak everywhere" when mean
    and last disagree (RESULTS.md dynamics study)."""
    if time_pool == "mean":
        return feats.mean(axis=1)
    if time_pool == "last":
        return feats[:, -1]
    if time_pool == "max":
        return feats.max(axis=1)
    raise ValueError(
        f"time_pool must be 'mean'|'last'|'max', got {time_pool!r}")


def extract_speaker_features(
    model: CPCModel, params, dataset: ProbeDataset, *,
    feature: str = "c", max_snippets: int = 512, normalize: bool = True,
    time_pool: str = "mean",
):
    """One forward sweep -> (pooled (N, d), labels (N,), source files (N,)).
    Extraction dominates probe cost; callers probing several splits/seeds
    (benchmarks/probe_study.py) extract once and reuse.

    time_pool='mean' averages the trajectory; 'last' takes the final frame —
    for a recurrent gar, c[:, -1] is where evidence integrated over the
    whole snippet lives (e.g. a speaker posterior accumulated across phone
    transitions), which mean pooling dilutes with uninformed early frames."""
    feats, labels, files = extract_speaker_frame_features(
        model, params, dataset, feature=feature, max_snippets=max_snippets,
        normalize=normalize)
    return pool_time(feats, time_pool), labels, files


def probe_speaker_features(
    pooled: np.ndarray, y: np.ndarray, files, num_classes: int, *,
    eval_frac: float = 0.25, steps: int = 300, seed: int = 0,
    pool: str = "snippet", split: str = "snippet", feature: str = "c",
) -> LinearProbeResult:
    """Linear speaker probe on pre-extracted pooled features (see
    run_speaker_probe for the pool/split semantics)."""
    n = len(pooled)
    if pool == "utterance":
        if split not in ("snippet", "file"):
            # utterance pooling is file-disjoint by construction, so either
            # split value is acceptable — but an invalid one must still raise
            # (it raises on every other pool/split combination)
            raise ValueError(f"split must be 'snippet'|'file', got {split!r}")
        groups: dict = {}
        for i in range(n):
            groups.setdefault(files[i], []).append(i)
        idx_groups = list(groups.values())
        pooled = np.stack([pooled[ix].mean(axis=0) for ix in idx_groups])
        y = np.asarray([y[ix[0]] for ix in idx_groups])
        tr, ev = _split(len(pooled), eval_frac, seed)
    elif pool != "snippet":
        raise ValueError(f"pool must be 'snippet'|'utterance', got {pool!r}")
    else:
        tr, ev = _split_items(n, files, split, eval_frac, seed)
    if len(tr) == 0 or len(ev) == 0:
        raise ValueError(
            f"probe split produced {len(tr)} train / {len(ev)} eval items "
            "(too few files/snippets for the requested split)")
    acc = _train_linear(pooled[tr], y[tr], pooled[ev], y[ev],
                        num_classes, steps=steps, seed=seed)
    return LinearProbeResult(acc, num_classes, len(tr), len(ev), feature)


def extract_phone_frame_features(
    model: CPCModel, params, dataset: ProbeDataset, *,
    feature: str = "c", max_snippets: int = 256, normalize: bool = True,
):
    """One forward sweep over the phone-labeled snippets -> (feats (N, T, d),
    frame labels (N, T), source files (N,)). Phone labels are per-sample;
    each latent frame takes the majority label of its receptive stride.
    Callers probing several splits/seeds extract once and reuse."""
    n = min(len(dataset), max_snippets)
    snippets, frame_labels, files = [], [], []
    for i in range(n):
        x, _, phones = dataset.item_with_labels(i)
        if phones is None:
            continue  # unlabeled snippet (no/partial alignment): skip
        snippets.append(x)
        frame_labels.append(phones)
        files.append(dataset.locate(i)[0])
    if not snippets:
        raise ValueError(
            "phone probe needs <utt>.phones.npy label files "
            "(the synthetic generator writes them; for real corpora dump "
            "forced alignments in the same format)")
    feats = _extract(model, params, np.stack(snippets), feature,
                     normalize=normalize)  # (N, T, d)
    N, T, _ = feats.shape
    ds = len(snippets[0]) // T
    # majority label per frame
    lab = np.stack(frame_labels)[:, :T * ds].reshape(N, T, ds)
    frame_lab = np.apply_along_axis(
        lambda a: np.bincount(a).argmax(), 2, lab)  # (N, T)
    return feats, frame_lab, files


def probe_phone_features(
    feats: np.ndarray, frame_lab: np.ndarray, files, *,
    num_phones: Optional[int] = None, eval_frac: float = 0.25,
    steps: int = 300, seed: int = 0, split: str = "snippet",
    feature: str = "c",
) -> LinearProbeResult:
    """Frame-level linear phone probe on pre-extracted features.

    The split is at snippet granularity (never frame — frames of one
    snippet always stay together); split='file' additionally holds out
    whole source files, so eval frames come from utterances the probe
    never saw. The snippet split leaks per-utterance signatures exactly as
    it does for the speaker probe (RESULTS.md probe study)."""
    N, T, d = feats.shape
    X = feats.reshape(N * T, d)
    y = frame_lab.reshape(N * T)
    n_classes = num_phones or int(y.max()) + 1
    tr, ev = _split_items(N, files, split, eval_frac, seed)
    if len(tr) == 0 or len(ev) == 0:
        raise ValueError(
            f"phone probe split produced {len(tr)} train / {len(ev)} eval "
            "snippets (too few labeled files/snippets for the requested "
            "split)")
    tr_mask = np.zeros(N, bool); tr_mask[tr] = True
    tr_idx = np.repeat(tr_mask, T)
    acc = _train_linear(X[tr_idx], y[tr_idx], X[~tr_idx], y[~tr_idx],
                        n_classes, steps=steps, seed=seed)
    return LinearProbeResult(acc, n_classes, int(tr_idx.sum()),
                             int((~tr_idx).sum()), feature)


def run_phone_probe(
    model: CPCModel, params, dataset: ProbeDataset, *,
    feature: str = "c", max_snippets: int = 256, eval_frac: float = 0.25,
    steps: int = 300, seed: int = 0, num_phones: Optional[int] = None,
    normalize: bool = True, split: str = "snippet",
) -> LinearProbeResult:
    """Per-frame features -> frame-level phone labels (BASELINE.json:11).
    See probe_phone_features for the split semantics."""
    feats, frame_lab, files = extract_phone_frame_features(
        model, params, dataset, feature=feature, max_snippets=max_snippets,
        normalize=normalize)
    return probe_phone_features(
        feats, frame_lab, files, num_phones=num_phones, eval_frac=eval_frac,
        steps=steps, seed=seed, split=split, feature=feature)
