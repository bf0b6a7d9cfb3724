"""PyTorch checkpoint interop: migrate reference-trained weights in, and
export cpc_tpu weights out.

The reference framework (SURVEY.md §3; a pure-PyTorch CPC repo) stores
`torch.save` state_dicts of a conv-encoder + GRU + prediction-heads model.
A user switching to this framework should be able to bring those trained
weights along — and a parity claim is only testable against REAL torch
modules. This module does both jobs:

  * `params_from_torch(state_dict, cfg)` — torch state_dict → flax params
    for `CPCModel(cfg.model)`. Classification is structural (shapes + the
    stable torch parameter-name suffixes like `weight_ih_l0`), not
    name-map-based, so any module nesting/prefixes the reference (or a
    fork) uses will import — the exact reference key names are
    unrecoverable offline (SURVEY.md §0).
  * `to_torch_state_dict(variables, cfg)` — the reverse, under canonical
    key names, loadable into `torch.nn` modules with the reference
    architecture (tests/test_interop.py builds exactly that model and pins
    forward parity torch-vs-jax to 1e-4).
  * CLI: `python -m cpc_tpu.interop ckpt.pt --config=baseline
    --workdir=runs/imported` writes a step-0 checkpoint (imported params +
    fresh optimizer state) that `--resume` / eval pick up like any other.

Layout facts the mapping encodes (verified against torch in the tests):
  * torch Conv1d weight is (out, in, k); flax Conv kernel is (k, in, out).
  * torch GRU packs weight_ih_l{n} as (3H, D) in gate order r,z,n; our GRU
    stores wi as (D, 3H) in the same gate order (models/gru.py).
  * heads: one fused Linear d_ar → K·d_enc (weight (K·d_enc, d_ar)) OR K
    separate (d_enc, d_ar) matrices — both forms import; output feature
    k·d_enc+e of the fused form is row e of W_k, matching CPCModel's
    `.reshape(B, T, K, d_enc)`.
  * BatchNorm (cfg norm='batch'): torch weight/bias → norm scale/bias.
    Running statistics are dropped — this framework's BN is stateless
    batch-stats math (training-mode torch BN; models/encoder.py explains
    why running averages don't fit pure-functional jit), so inference-mode
    torch numerics are NOT reproduced, training-mode numerics are.

Only the conv1d+GRU family (the reference's architecture) imports;
scalogram/transformer configs raise — they have no reference checkpoints
to migrate. The EXPORT direction additionally covers the transformer gar
(`_export_transformer_gar`): that is how the torch training-parity oracle
(tests/torch_oracle.py) is initialized from CPCModel weights, giving the
BASELINE.json:9 variant a cross-framework check (VERDICT r4 next #7).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.config import CPCConfig

_GRU_RE = re.compile(r"(?:^|\.)(weight|bias)_(ih|hh)_l(\d+)$")


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray → float32 numpy (torch optional import)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _classify(sd: Dict) -> Dict:
    """Structural classification of a torch state_dict. Returns dict with
    conv (ordered [(prefix, weight, bias|None)]), norm (ordered
    [(prefix, weight, bias)]), gru {layer: {wi, wh, bi, bh}}, and
    linear (ordered [(prefix, weight, bias|None)])."""
    conv: List[Tuple[str, np.ndarray, np.ndarray]] = []
    linear: List[Tuple[str, np.ndarray]] = []
    gru: Dict[int, Dict[str, np.ndarray]] = {}
    norm: List[Tuple[str, np.ndarray, np.ndarray]] = []
    bias_by_prefix = {k[:-5]: v for k, v in sd.items() if k.endswith(".bias")
                      or k == "bias"}

    running = {k[: -len(".running_mean")] for k in sd
               if k.endswith("running_mean")}
    for key in sd:  # state_dict preserves registration order = layer order
        m = _GRU_RE.search(key)
        if m:
            kind, which, layer = m.groups()
            slot = {"weight": {"ih": "wi", "hh": "wh"},
                    "bias": {"ih": "bi", "hh": "bh"}}[kind][which]
            gru.setdefault(int(layer), {})[slot] = _np(sd[key])
            continue
        if not (key.endswith(".weight") or key == "weight"):
            continue
        prefix = key[: -len(".weight")] if key.endswith(".weight") else ""
        w = _np(sd[key])
        b = bias_by_prefix.get(prefix)
        if w.ndim == 3:
            conv.append((prefix, w, None if b is None else _np(b)))
        elif w.ndim == 2:
            linear.append((prefix, w, None if b is None else _np(b)))
        elif w.ndim == 1 and prefix in running:
            norm.append((prefix, w, _np(b)))
    return {"conv": conv, "gru": gru, "linear": linear, "norm": norm}


def params_from_torch(state_dict: Dict, cfg: CPCConfig):
    """torch state_dict → flax variables for CPCModel(cfg.model), validated
    leaf-for-leaf against the model's own init tree."""
    mc = cfg.model
    if mc.encoder.kind != "conv1d" or mc.ar.kind != "gru":
        raise ValueError(
            "torch import covers the reference architecture only "
            f"(conv1d encoder + GRU gar); got encoder={mc.encoder.kind!r} "
            f"ar={mc.ar.kind!r}")
    cls = _classify(state_dict)

    n_layers = len(mc.encoder.channels)
    if len(cls["conv"]) != n_layers:
        raise ValueError(
            f"config expects {n_layers} conv layers, state_dict has "
            f"{len(cls['conv'])} ({[p for p, *_ in cls['conv']]})")
    encoder: Dict = {}
    for i, ((prefix, w, b), ch, k) in enumerate(
            zip(cls["conv"], mc.encoder.channels, mc.encoder.kernels)):
        if w.shape[0] != ch or w.shape[2] != k:
            raise ValueError(
                f"conv{i} ({prefix!r}): torch weight {w.shape} does not "
                f"match config (out={ch}, k={k})")
        encoder[f"conv{i}"] = {
            "kernel": w.transpose(2, 1, 0),  # (out,in,k) → (k,in,out)
            # flax Conv always has a bias; a bias-free torch conv imports
            # as zeros (identical forward)
            "bias": b if b is not None else np.zeros(ch, np.float32),
        }
    if cls["norm"]:
        if mc.encoder.norm != "batch":
            raise ValueError(
                "state_dict carries BatchNorm layers but the config has "
                f"encoder.norm={mc.encoder.norm!r}; import with a config "
                "whose encoder.norm='batch'")
        if len(cls["norm"]) != n_layers:
            raise ValueError(f"expected {n_layers} BN layers, got "
                             f"{len(cls['norm'])}")
        for i, (prefix, w, b) in enumerate(cls["norm"]):
            encoder[f"norm{i}"] = {"scale": w, "bias": b}
    elif mc.encoder.norm == "batch":
        raise ValueError("config encoder.norm='batch' but the state_dict "
                         "has no BatchNorm parameters")

    if len(cls["gru"]) != mc.ar.num_layers:
        raise ValueError(f"config expects {mc.ar.num_layers} GRU layers, "
                         f"state_dict has {len(cls['gru'])}")
    gar: Dict = {}
    for layer, slots in sorted(cls["gru"].items()):
        missing = {"wi", "wh", "bi", "bh"} - set(slots)
        if missing:
            raise ValueError(f"GRU layer {layer} missing {sorted(missing)}")
        gar[f"layer{layer}"] = {
            "wi": slots["wi"].T,  # (3H, D) → (D, 3H); gate order r,z,n both
            "wh": slots["wh"].T,
            "bi": slots["bi"],
            "bh": slots["bh"],
        }

    K, d_enc, d_ar = (mc.loss.prediction_steps, mc.encoder.d_enc, mc.ar.d_ar)
    lin = cls["linear"]
    if len(lin) == 1 and lin[0][1].shape == (K * d_enc, d_ar):
        heads_w, heads_b = lin[0][1].T, lin[0][2]
    elif len(lin) == K and all(w.shape == (d_enc, d_ar) for _, w, _ in lin):
        # K separate W_k: fused output feature k·d_enc+e = row e of W_k
        heads_w = np.concatenate([w.T for _, w, _ in lin], axis=1)
        heads_b = None if all(b is None for _, _, b in lin) else np.concatenate(
            [b if b is not None else np.zeros(d_enc, np.float32)
             for _, _, b in lin])
    else:
        raise ValueError(
            f"prediction heads not found: need one (K·d_enc, d_ar)="
            f"({K * d_enc}, {d_ar}) Linear or {K}x (d_enc, d_ar)=({d_enc}, "
            f"{d_ar}); state_dict has "
            f"{[(p, w.shape) for p, w, _ in lin]}")
    if heads_b is not None and np.any(heads_b != 0):
        raise ValueError(
            "torch heads carry a nonzero bias; CPCModel's bilinear heads "
            "are bias-free (SURVEY.md §A) and cannot represent it")

    dt = {"float32": np.float32, "bfloat16": jnp.bfloat16,
          "float16": np.float16}[mc.param_dtype]
    params = {"params": {
        "encoder": encoder,
        "gar": gar,
        "prediction_heads": {"kernel": heads_w},
    }}
    params = jax.tree.map(lambda a: jnp.asarray(a, dt), params)

    # leaf-for-leaf validation against the model's own init tree: catches
    # any config/state_dict mismatch the shape checks above missed
    from cpc_tpu.models.cpc import CPCModel
    model = CPCModel(mc)
    probe_len = max(cfg.data.snippet_samples, 3200)
    ref = jax.eval_shape(model.init, jax.random.key(0),
                         jnp.zeros((1, probe_len), jnp.float32))
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError("imported tree does not match CPCModel.init:\n"
                         f"  model: {ref_shapes}\n  import: {got_shapes}")
    return params


def to_torch_state_dict(variables, cfg: CPCConfig) -> Dict[str, np.ndarray]:
    """CPCModel params → torch-layout state_dict under canonical names
    (encoder.conv{i}.weight/bias, [encoder.bn{i}.*], gar.weight_ih_l{n}...,
    prediction_heads.weight). Values are float32 numpy arrays —
    `torch.load`-free on this side; wrap with torch.from_numpy to load."""
    mc = cfg.model
    p = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for i in range(len(mc.encoder.channels)):
        leaf = p["encoder"][f"conv{i}"]
        out[f"encoder.conv{i}.weight"] = (
            _np(leaf["kernel"]).transpose(2, 1, 0))
        out[f"encoder.conv{i}.bias"] = _np(leaf["bias"])
        if mc.encoder.norm == "batch":
            nl = p["encoder"][f"norm{i}"]
            ch = mc.encoder.channels[i]
            out[f"encoder.bn{i}.weight"] = _np(nl["scale"])
            out[f"encoder.bn{i}.bias"] = _np(nl["bias"])
            # stateless batch-stats norm has no running averages; emit the
            # torch-BN identity defaults so the dict LOADS cleanly (torch
            # eval-mode numerics then differ — documented above)
            out[f"encoder.bn{i}.running_mean"] = np.zeros(ch, np.float32)
            out[f"encoder.bn{i}.running_var"] = np.ones(ch, np.float32)
    if mc.ar.kind == "transformer":
        _export_transformer_gar(p["gar"], mc, out)
    else:
        for layer in range(mc.ar.num_layers):
            leaf = p["gar"][f"layer{layer}"]
            out[f"gar.weight_ih_l{layer}"] = _np(leaf["wi"]).T
            out[f"gar.weight_hh_l{layer}"] = _np(leaf["wh"]).T
            out[f"gar.bias_ih_l{layer}"] = _np(leaf["bi"])
            out[f"gar.bias_hh_l{layer}"] = _np(leaf["bh"])
    out["prediction_heads.weight"] = _np(
        p["prediction_heads"]["kernel"]).T
    return out


def _export_transformer_gar(g: Dict, mc, out: Dict[str, np.ndarray]) -> None:
    """CausalTransformer params → torch-Linear-layout keys (VERDICT r4 next
    #7: the transformer-gar torch oracle imports through here, mirroring
    models/transformer.py exactly).

    Layout facts this encodes (pinned by tests/test_interop.py):
      * flax DenseGeneral q/k/v kernels are (d, H, Dh) with (H, Dh) bias;
        a torch Linear(d, d) sees them flattened — feature h*Dh+e of the
        flat form is head h, channel e (the same order the out projection's
        (H, Dh, d) kernel contracts);
      * torch Linear weight is (out, in) = flax kernel transposed;
      * names match tests/torch_oracle._TorchTransformerGar attributes so
        the oracle's load_state_dict needs no renaming for the gar."""
    d = mc.ar.d_ar
    out["gar.in_proj.weight"] = _np(g["in_proj"]["kernel"]).T
    out["gar.in_proj.bias"] = _np(g["in_proj"]["bias"])
    out["gar.pos_embed"] = _np(g["pos_embed"])
    for i in range(mc.ar.num_layers):
        blk = g[f"block{i}"]
        pre = f"gar.blocks.{i}."
        out[pre + "ln_attn.weight"] = _np(blk["LayerNorm_0"]["scale"])
        out[pre + "ln_attn.bias"] = _np(blk["LayerNorm_0"]["bias"])
        mha = blk["MultiHeadDotProductAttention_0"]
        for name, short in (("query", "attn_q"), ("key", "attn_k"),
                            ("value", "attn_v")):
            out[pre + f"{short}.weight"] = (
                _np(mha[name]["kernel"]).reshape(d, d).T)
            out[pre + f"{short}.bias"] = _np(mha[name]["bias"]).reshape(d)
        out[pre + "attn_out.weight"] = (
            _np(mha["out"]["kernel"]).reshape(d, d).T)
        out[pre + "attn_out.bias"] = _np(mha["out"]["bias"])
        out[pre + "ln_mlp.weight"] = _np(blk["LayerNorm_1"]["scale"])
        out[pre + "ln_mlp.bias"] = _np(blk["LayerNorm_1"]["bias"])
        out[pre + "fc1.weight"] = _np(blk["Dense_0"]["kernel"]).T
        out[pre + "fc1.bias"] = _np(blk["Dense_0"]["bias"])
        out[pre + "fc2.weight"] = _np(blk["Dense_1"]["kernel"]).T
        out[pre + "fc2.bias"] = _np(blk["Dense_1"]["bias"])
    out["gar.final_norm.weight"] = _np(g["final_norm"]["scale"])
    out["gar.final_norm.bias"] = _np(g["final_norm"]["bias"])


def import_checkpoint(ckpt_path: str, cfg: CPCConfig, workdir: str) -> int:
    """Load a torch .pt/.pth file, convert, and write a step-0 cpc_tpu
    checkpoint (+ the resolved config) into workdir. Returns the step."""
    import os

    import torch

    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.checkpoint import CheckpointManager
    from cpc_tpu.train.train_step import make_optimizer

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    # accept either a bare state_dict or the common {"model": sd, ...} /
    # {"state_dict": sd, ...} wrappers
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    params = params_from_torch(obj, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    _ = CPCModel(cfg.model)  # config sanity (raises on bad kinds)

    os.makedirs(workdir, exist_ok=True)
    mgr = CheckpointManager(os.path.join(workdir, cfg.train.checkpoint_dir),
                            async_save=False)
    mgr.save(0, params, opt_state,
             {"seed": cfg.train.seed, "epoch": 0, "pos": 0})
    mgr.wait()
    mgr.close()
    import json

    from cpc_tpu.config import to_dict
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(to_dict(cfg), f, indent=1)
    return 0


def main(argv=None) -> int:
    import argparse

    from cpc_tpu.config import presets

    p = argparse.ArgumentParser(
        prog="cpc_tpu.interop",
        description="import a torch CPC checkpoint as a cpc_tpu workdir")
    p.add_argument("checkpoint", help="torch .pt/.pth state_dict file")
    p.add_argument("--config", default="baseline",
                   help="preset the weights belong to (architecture must "
                        "match: conv channels/kernels, d_ar, K)")
    p.add_argument("--workdir", required=True,
                   help="output workdir (gets checkpoints/0 + config.json; "
                        "train --resume / eval pick it up)")
    args = p.parse_args(argv)
    cfg = presets.by_name(args.config)
    import_checkpoint(args.checkpoint, cfg, args.workdir)
    print(f"imported {args.checkpoint} -> {args.workdir} (step 0, "
          f"config {cfg.name})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
