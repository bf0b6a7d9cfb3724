"""Typed experiment configuration.

The reference configures experiments with edit-in-place Python dicts and no CLI
(SURVEY.md §6.6). Here every experiment is a frozen dataclass; the named presets
below cover each config in BASELINE.json:6-12.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """genc: strided conv encoder over raw waveform (SURVEY.md §A).

    Defaults are the CPC-paper / reference baseline: 5 Conv1d layers,
    channels 512, kernels (10,8,4,4,4), strides (5,4,2,2,2) => 160x
    downsampling, one latent per 10 ms at 16 kHz.

    `padding='SAME'` gives exactly T//160 latents for T samples (20480 -> 128),
    matching SURVEY.md §A's "20480 samples -> 128 latents". 'VALID' mirrors
    torch's default zero padding (20480 -> 126) and is kept as an option.
    """

    kind: str = "conv1d"  # 'conv1d' | 'scalogram'
    channels: Tuple[int, ...] = (512, 512, 512, 512, 512)
    kernels: Tuple[int, ...] = (10, 8, 4, 4, 4)
    strides: Tuple[int, ...] = (5, 4, 2, 2, 2)
    padding: str = "SAME"  # 'SAME' | 'VALID'
    norm: str = "none"  # 'none' | 'layer' | 'group' | 'batch'
    activation: str = "relu"
    d_enc: int = 512  # output latent dim (== channels[-1])
    use_pallas: bool = False  # fused Pallas conv pyramid (SAME/relu/no-norm)
    pallas_time_tile: int = 64  # final latents per kernel program
    # Rematerialize each conv layer in the backward pass (jax.checkpoint per
    # (conv, norm, act) block): only layer-BOUNDARY activations are kept
    # live across the forward; per-layer internals (pre-activation values,
    # relu masks) are recomputed during backprop. Halves encoder activation
    # memory — the dominant long-context cost, since the first conv layer's
    # output is (B, T/5, 512) — for one extra forward's FLOPs. Incompatible
    # with use_pallas (the fused pyramid never materializes intermediates).
    remat: bool = False

    # scalogram front-end (music/MAESTRO variant, BASELINE.json:8) --------
    scalogram_n_fft: int = 1024
    scalogram_hop: int = 160  # keeps the one-latent-per-10ms contract pre-conv
    scalogram_n_bins: int = 128
    scalogram_fmin: float = 32.7  # C1; log-spaced (CQT-like) filterbank
    scalogram_fmax: float = 8000.0
    # 'mel' | 'log' (geometric centers, fixed STFT window) | 'cqt' (true
    # constant-Q: per-bin geometric windows, ops/scalogram.cqt)
    scalogram_scale: str = "mel"
    # 2-D conv stack over (freq, time) for the scalogram encoder
    scalogram_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    scalogram_kernels: Tuple[Tuple[int, int], ...] = (
        (3, 3), (3, 3), (3, 3), (3, 3), (3, 3),
    )
    scalogram_freq_strides: Tuple[int, ...] = (2, 2, 2, 2, 2)
    scalogram_time_strides: Tuple[int, ...] = (1, 1, 1, 1, 1)

    @property
    def total_downsample(self) -> int:
        if self.kind == "scalogram":
            ds = self.scalogram_hop
            for s in self.scalogram_time_strides:
                ds *= s
            return ds
        ds = 1
        for s in self.strides:
            ds *= s
        return ds


@dataclasses.dataclass(frozen=True)
class ArConfig:
    """gar: autoregressive context network (SURVEY.md §A).

    Baseline: 1-layer GRU, d_ar=256. Variant (BASELINE.json:9): causal
    transformer.
    """

    kind: str = "gru"  # 'gru' | 'transformer'
    d_ar: int = 256
    num_layers: int = 1
    use_pallas: bool = False  # Pallas scan kernel for the GRU recurrence
    # transformer-only knobs
    num_heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.0
    max_len: int = 2048  # positional table size
    # 'xla' (default; fused-softmax O(T^2) scores — right answer at the
    # reference's ~128-latent snippets) | 'flash' (Pallas streaming-softmax
    # kernel, ops/attention_pallas.py — the context-scaling regime where
    # B*H*T^2 score materialization stops fitting; requires dropout=0.0)
    # | 'flash16' (same kernel, post-softmax matmuls fed bf16 at the MXU's
    # 2x bf16 issue rate; softmax statistics and accumulators stay fp32)
    # | 'ring' (context parallelism: apply the gar under shard_map with z
    # sharded along T on the `cp_axis` mesh axis; attention runs the KV
    # ppermute ring of ops/attention_ring.py — see parallel/cp.py)
    attn_impl: str = "xla"
    cp_axis: str = "ctx"  # mesh axis name for attn_impl='ring'
    # Rematerialize each transformer block in the backward pass
    # (jax.checkpoint per pre-LN block): only block-boundary (B, T, d_ar)
    # residuals stay live; attention/MLP internals are recomputed during
    # backprop. Transformer-only (the GRU's lax.scan recurrence must keep
    # its per-step carries either way — CPCModel rejects remat+gru rather
    # than ship a silent no-op knob). Composes with every attn_impl,
    # including the ring (collectives are replayed in the recompute).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """InfoNCE over bilinear k-step scores with in-batch negatives
    (SURVEY.md §4.1, §A).

    negatives:
      'same_step'  — candidates for a (t, k) prediction are the other batch
                     elements' latents at the same target step t+k (B-way
                     softmax; the reference's in-batch layout).
      'all_steps'  — candidates are every latent of every batch element
                     (B*T-way softmax; CPC-paper style "same sequence + other
                     sequences" negative pool).
    cross_replica — all-gather z across the data mesh axis so the negative
                    pool is the *global* batch (BASELINE.json:10). Defaults
                    True: under data parallelism this preserves the
                    single-device in-batch semantics (the reference's
                    whole-batch negative pool); False restricts negatives to
                    the replica-local batch (cheaper, different objective —
                    SURVEY.md §8.4 parity note).
    """

    prediction_steps: int = 12  # K
    negatives: str = "same_step"  # 'same_step' | 'all_steps'
    cross_replica: bool = True
    use_pallas: bool = False  # fused Pallas InfoNCE kernel on the hot path
    pallas_bf16: bool = False  # bf16 wire into the kernel (fp32 accumulate)
    # Fold the prediction-heads matmul into the loss (ops/infonce_fused):
    # preds never materialize outside the matmul's natural layout. Fastest
    # same_step path; requires use_pallas and a global candidate pool <= 1024.
    fuse_heads: bool = False
    # all_steps + cross_replica only: sweep the global candidate pool over a
    # ppermute ring (ops/infonce_ring) instead of all-gathering it —
    # per-replica memory independent of the replica count (SURVEY.md §6.7).
    ring: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    encoder: EncoderConfig = EncoderConfig()
    ar: ArConfig = ArConfig()
    loss: LossConfig = LossConfig()
    dtype: str = "float32"  # compute dtype for activations ('bfloat16' on TPU)
    param_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Snippet dataset contract (SURVEY.md §4.4): a deterministic flat
    (file, offset) index of fixed-length snippets."""

    corpus_dir: str = ""
    sample_rate: int = 16_000
    snippet_samples: int = 20_480  # visible window + prediction horizon
    snippet_stride: Optional[int] = None  # default: snippet_samples (no overlap)
    batch_size: int = 8
    shuffle: bool = True
    normalize: bool = True  # per-snippet mean/var normalization, on device
    # on-device augmentation (BASELINE.json:5), applied inside the jitted
    # step from a per-step PRNG key
    augment: bool = False
    augment_gain_db: float = 6.0
    augment_noise_snr_db: float = 30.0
    augment_shift_max: int = 160
    prefetch: int = 2
    num_workers: int = 0  # host decode threads (0 = synchronous)
    transfer_dtype: str = "int16"  # host->device wire dtype; dequant on device
    # Upload the WHOLE int16 snippet corpus to device HBM once and feed
    # each step a (B,) index vector; the batch gather runs on device inside
    # the jitted step. Removes per-step host->device batch transfers —
    # necessary on hosts whose transfer stack retains every staged buffer
    # (the axon tunnel leaks its full payload per transfer, measured in
    # docs/DESIGN.md) and generally the fastest small-corpus path.
    # Single-device only; corpus must fit the HBM budget (guarded).
    device_corpus: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-4  # Adam, CPC paper
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0  # clip grads to this global norm (0 = off)
    lr_schedule: str = "constant"  # 'constant' | 'cosine' (decay to 0 over
    # num_steps; both compose with warmup_steps)
    num_steps: int = 10_000
    warmup_steps: int = 0
    accum_steps: int = 1  # microbatches per optimizer step: the batch is
    # split in accum_steps, grads averaged, ONE Adam update. Each microbatch
    # is its own InfoNCE negative pool (same semantics as DP without
    # cross-replica gathering) — this buys optimizer-step stability and
    # memory, not a bigger pool.
    seed: int = 0
    log_every: int = 50
    eval_every: int = 500
    checkpoint_every: int = 1000
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel axis spans all devices
    mesh_axes: Tuple[str, ...] = ("data",)
    donate_state: bool = True
    # 'dp' (batch sharded — the default), 'cp' (context parallel: the
    # snippet's TIME axis sharded over a 'ctx' mesh; transformer gar +
    # all_steps negatives required — parallel/cp.py), or 'dpcp' (2-D
    # data x ctx mesh: batch AND time sharded; set mesh_shape/mesh_axes
    # to the 2-D mesh explicitly, e.g. (2, 4) / ('data', 'ctx'))
    parallel: str = "dp"


@dataclasses.dataclass(frozen=True)
class CPCConfig:
    name: str = "baseline"
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()


def to_dict(cfg: CPCConfig) -> dict:
    """JSON-ready dict of a config (tuples become lists)."""
    return dataclasses.asdict(cfg)


def from_dict(d: dict) -> CPCConfig:
    """Inverse of to_dict: rebuilds the frozen dataclass tree, restoring
    the tuple-typed fields JSON flattened to lists. Unknown keys raise —
    a config written by a newer version should not silently lose knobs.

    Nested configs are recognized by the field's TYPE ANNOTATION (with
    Optional unwrapped), not its default value, so fields declared with
    default_factory or `Optional[SubConfig] = None` deserialize correctly
    instead of leaving a raw dict in the frozen tree."""
    import typing

    def build(cls, sub):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        hints = typing.get_type_hints(cls)
        unknown = set(sub) - set(fields)
        if unknown:
            raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
        kw = {}
        for k, v in sub.items():
            t = hints.get(k)
            if typing.get_origin(t) is typing.Union:
                args = [a for a in typing.get_args(t) if a is not type(None)]
                if len(args) == 1:
                    t = args[0]
            if dataclasses.is_dataclass(t) and isinstance(v, dict):
                kw[k] = build(t, v)
            elif isinstance(v, list):
                kw[k] = tuple(tuple(e) if isinstance(e, list) else e
                              for e in v)
            else:
                kw[k] = v
        return cls(**kw)

    return build(CPCConfig, d)


def apply_overrides(cfg: CPCConfig, overrides) -> CPCConfig:
    """cfg with 'dotted.path=value' strings applied — the CLI's `--set`.

    Every knob in the frozen config tree is reachable without writing a
    preset: `--set model.ar.attn_impl=flash16 --set train.learning_rate=3e-4
    --set model.encoder.channels=256,256,512`. Values coerce to the FIELD's
    annotated type (int/float/bool/str; comma-separated for tuples;
    'none' clears an Optional). Unknown paths and uncoercible values raise
    with the full path — same contract as from_dict's unknown-key check.
    """
    import typing

    def scalar(raw, t, full):
        if t is bool:
            low = raw.lower()
            if low in ("1", "true", "yes", "on"):
                return True
            if low in ("0", "false", "no", "off"):
                return False
            raise ValueError(f"--set {full}: {raw!r} is not a bool")
        if t in (int, float, str):
            try:
                return t(raw)
            except ValueError as e:
                raise ValueError(f"--set {full}: {e}") from e
        raise ValueError(f"--set {full}: fields of type {t} are not "
                         f"settable from the command line")

    def coerce(raw, t, full):
        origin = typing.get_origin(t)
        if origin is typing.Union:  # Optional[X]
            args = [a for a in typing.get_args(t) if a is not type(None)]
            if raw.lower() in ("none", "null"):
                return None
            t = args[0]
            origin = typing.get_origin(t)
        if origin is tuple:
            et = next((a for a in typing.get_args(t)
                       if a is not Ellipsis), int)
            if typing.get_origin(et) is not None:
                raise ValueError(f"--set {full}: nested-tuple fields are "
                                 f"not settable from the command line")
            return tuple(scalar(e, et, full)
                         for e in raw.split(",") if e != "")
        return scalar(raw, t, full)

    def set_path(node, keys, raw, full):
        k = keys[0]
        fields = {f.name for f in dataclasses.fields(node)}
        if k not in fields:
            raise ValueError(
                f"--set {full}: {type(node).__name__} has no field {k!r} "
                f"(has: {sorted(fields)})")
        cur = getattr(node, k)
        if len(keys) > 1:
            if not dataclasses.is_dataclass(cur):
                raise ValueError(f"--set {full}: {k!r} is a leaf field, "
                                 f"not a config section")
            return dataclasses.replace(
                node, **{k: set_path(cur, keys[1:], raw, full)})
        t = typing.get_type_hints(type(node))[k]
        return dataclasses.replace(node, **{k: coerce(raw, t, full)})

    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"--set expects dotted.path=value, got {ov!r}")
        path, raw = ov.split("=", 1)
        cfg = set_path(cfg, path.split("."), raw, path)
    return cfg


class presets:
    """Named presets, one per BASELINE.json config (lines 6-12)."""

    @staticmethod
    def baseline() -> CPCConfig:
        """CPC baseline: 5-layer strided conv (160x) + 1-layer GRU, K=12,
        batch 8 (BASELINE.json:7)."""
        return CPCConfig(name="baseline")

    @staticmethod
    def maestro_scalogram() -> CPCConfig:
        """Scalogram front-end variant on music audio, spectrogram computed on
        device (BASELINE.json:8)."""
        return CPCConfig(
            name="maestro_scalogram",
            model=ModelConfig(
                encoder=EncoderConfig(kind="scalogram", scalogram_scale="log"),
            ),
        )

    @staticmethod
    def transformer_gar() -> CPCConfig:
        """Causal-transformer context network replacing the GRU
        (BASELINE.json:9).

        Bakes in the measured training recipe: without LR warmup + global-
        norm grad clipping this model flatlines at the 1/pool accuracy
        floor with grad-norm spikes to 12+ in its first 1000 steps, while
        the same seed trains cleanly with them (docs/DESIGN.md "transformer
        gar needs warmup + clipping"; RESULTS.md run 6). The GRU presets
        need neither, so the knobs live here, not in TrainConfig defaults."""
        return CPCConfig(
            name="transformer_gar",
            model=ModelConfig(ar=ArConfig(kind="transformer", d_ar=256,
                                          num_layers=2, num_heads=8)),
            train=TrainConfig(warmup_steps=1000, grad_clip_norm=1.0),
        )

    @staticmethod
    def dp_global_negatives() -> CPCConfig:
        """Large-batch InfoNCE with cross-replica negative sharing over ICI
        (BASELINE.json:10)."""
        return CPCConfig(
            name="dp_global_negatives",
            model=ModelConfig(
                ar=ArConfig(use_pallas=True),
                loss=LossConfig(cross_replica=True, use_pallas=True,
                                pallas_bf16=True, fuse_heads=True),
                dtype="bfloat16",
            ),
            data=DataConfig(batch_size=64),
        )

    @staticmethod
    def tpu_fast() -> CPCConfig:
        """Throughput config for the v5e bench: bf16 compute, large batch,
        Pallas hot path."""
        return CPCConfig(
            name="tpu_fast",
            model=ModelConfig(
                ar=ArConfig(use_pallas=True),
                loss=LossConfig(use_pallas=True, pallas_bf16=True,
                                fuse_heads=True),
                dtype="bfloat16",
            ),
            data=DataConfig(batch_size=64),
        )

    @staticmethod
    def scalogram_fast() -> CPCConfig:
        """Scalogram family at the bench perf configuration (bf16, batch 64,
        fused loss): the config whose measured throughput clears the 10k
        north star on this chip (BENCH_r03 `scalogram_value`). Shared by
        bench.py and the bf16 on-TPU golden pin so the regression gate
        covers exactly what the BENCH artifact reports."""
        base = presets.tpu_fast()
        return dataclasses.replace(
            base, name="scalogram_fast",
            model=dataclasses.replace(
                base.model,
                encoder=EncoderConfig(kind="scalogram",
                                      scalogram_scale="log"),
                ar=dataclasses.replace(base.model.ar, use_pallas=False)))

    @staticmethod
    def transformer_fast() -> CPCConfig:
        """Transformer family at the bench perf configuration (bf16, batch
        64, fused loss); see scalogram_fast. Carries the same warmup+clip
        recipe as transformer_gar (the collapse is architectural, not a
        precision artifact — docs/DESIGN.md)."""
        base = presets.tpu_fast()
        return dataclasses.replace(
            base, name="transformer_fast",
            model=dataclasses.replace(
                base.model,
                ar=ArConfig(kind="transformer", d_ar=256, num_layers=2,
                            num_heads=8)),
            train=dataclasses.replace(base.train, warmup_steps=1000,
                                      grad_clip_norm=1.0))

    @staticmethod
    def by_name(name: str) -> CPCConfig:
        fn = getattr(presets, name, None)
        if fn is None or name.startswith("_") or name == "by_name":
            raise KeyError(
                f"unknown preset {name!r}; available: "
                f"{[n for n in dir(presets) if not n.startswith('_') and n != 'by_name']}"
            )
        return fn()
