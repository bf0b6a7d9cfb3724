"""Reference-architecture PyTorch CPC trainer — the TRAINING-parity oracle.

BASELINE.json:5's acceptance clause is "InfoNCE k-step accuracy matching
the PyTorch reference within 1%". The reference binary is unrecoverable
offline (SURVEY.md §0), but torch itself is importable, so this module
builds the reference architecture (SURVEY.md §A: strided Conv1d pyramid +
ReLU, GRU gar, fused bias-free W_k heads) as real torch modules and trains
it with torch autograd + torch.optim.Adam — an executable stand-in whose
every layer semantics is already pinned against CPCModel by
tests/test_interop.py (forward equality through interop-converted weights
to 1e-4).

Mirrored semantics (each line cites the cpc_tpu definition it mirrors):
  * int16 dequant x/32768 + per-snippet mean/var normalization
    (ops/dsp.py::prepare_waveform; torch.var(unbiased=False) == jnp.var);
  * VALID conv padding (torch's native zero padding — the reference's
    default; config padding='VALID' mirrors it on the jax side);
  * InfoNCE with the uniform prediction window Tp = T - K, same_step OR
    all_steps candidate pools, positives on the (shifted) diagonal, loss =
    mean NLL over (Tp, K, B), per-k accuracy (ops/infonce.py);
  * Adam(lr, betas, eps=1e-8) == optax.adam (same bias correction, same
    eps placement outside the sqrt).

Used by tests/test_torch_parity.py (fast reduced-architecture guard) and
benchmarks/exp_torch_parity.py (the full baseline-config acceptance run
recorded in RESULTS.md).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

try:
    import torch
except ImportError:  # pragma: no cover - torch is baked into this image
    torch = None

from cpc_tpu.config import CPCConfig


class _TorchBlock(torch.nn.Module if torch else object):
    """One pre-LN causal block mirroring models/transformer.py::_Block with
    attn_impl='xla', dropout=0 (the parity configuration): flax-MHA
    numerics (q/sqrt(Dh) scaling, finfo-min causal bias, same-dtype
    softmax), flax LayerNorm eps=1e-6, flax nn.gelu's default TANH
    approximation."""

    def __init__(self, d: int, num_heads: int, mlp_ratio: int):
        super().__init__()
        if d % num_heads:
            raise ValueError(f"d_ar {d} not divisible by heads {num_heads}")
        self.ln_attn = torch.nn.LayerNorm(d, eps=1e-6)
        self.attn_q = torch.nn.Linear(d, d)
        self.attn_k = torch.nn.Linear(d, d)
        self.attn_v = torch.nn.Linear(d, d)
        self.attn_out = torch.nn.Linear(d, d)
        self.ln_mlp = torch.nn.LayerNorm(d, eps=1e-6)
        self.fc1 = torch.nn.Linear(d, d * mlp_ratio)
        self.fc2 = torch.nn.Linear(d * mlp_ratio, d)
        self._H = num_heads

    def forward(self, x):
        B, T, d = x.shape
        H = self._H
        dh = d // H
        h = self.ln_attn(x)
        q = self.attn_q(h).view(B, T, H, dh)
        k = self.attn_k(h).view(B, T, H, dh)
        v = self.attn_v(h).view(B, T, H, dh)
        scores = torch.einsum("bqhd,bkhd->bhqk", q / (dh ** 0.5), k)
        causal = torch.ones(T, T, dtype=torch.bool,
                            device=x.device).tril()
        scores = scores.masked_fill(~causal,
                                    torch.finfo(scores.dtype).min)
        w = torch.softmax(scores, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, d)
        x = x + self.attn_out(o)
        h = self.ln_mlp(x)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h),
                                              approximate="tanh"))
        return x + h


class _TorchTransformerGar(torch.nn.Module if torch else object):
    """models/transformer.py::CausalTransformer in torch: in_proj + learned
    positional table + pre-LN blocks + final LayerNorm. Attribute names
    match interop._export_transformer_gar's canonical keys, so
    load_state_dict takes the exported dict without renames."""

    def __init__(self, d_enc: int, ar) -> None:
        super().__init__()
        self.in_proj = torch.nn.Linear(d_enc, ar.d_ar)
        self.pos_embed = torch.nn.Parameter(
            torch.zeros(ar.max_len, ar.d_ar))
        self.blocks = torch.nn.ModuleList(
            [_TorchBlock(ar.d_ar, ar.num_heads, ar.mlp_ratio)
             for _ in range(ar.num_layers)])
        self.final_norm = torch.nn.LayerNorm(ar.d_ar, eps=1e-6)

    def forward(self, z):  # (B, T, d_enc) -> (B, T, d_ar)
        T = z.shape[1]
        x = self.in_proj(z) + self.pos_embed[:T][None]
        for blk in self.blocks:
            x = blk(x)
        return self.final_norm(x)


class TorchCPC(torch.nn.Module if torch else object):
    """The reference architecture, built from a CPCConfig: conv1d encoder
    plus a GRU gar (the baseline) or the causal-transformer gar variant
    (BASELINE.json:9) — the same two families cpc_tpu.interop exports."""

    def __init__(self, cfg: CPCConfig):
        super().__init__()
        mc = cfg.model
        if mc.encoder.kind != "conv1d" or mc.ar.kind not in (
                "gru", "transformer"):
            raise ValueError("the torch oracle covers conv1d encoders with "
                             "a GRU or transformer gar only")
        if mc.ar.kind == "transformer" and mc.ar.dropout:
            raise ValueError("parity runs are deterministic: set "
                             "ar.dropout=0 for the torch oracle")
        if mc.encoder.padding != "VALID":
            raise ValueError(
                "torch Conv1d's native padding is VALID; run parity with "
                "encoder.padding='VALID' (the jax side has it as a config "
                "option precisely for torch-matching runs)")
        if mc.encoder.norm not in ("none", "batch"):
            raise ValueError(f"unsupported norm {mc.encoder.norm!r}")
        convs, norms = [], []
        c_in = 1
        for ch, k, s in zip(mc.encoder.channels, mc.encoder.kernels,
                            mc.encoder.strides):
            convs.append(torch.nn.Conv1d(c_in, ch, k, stride=s))
            if mc.encoder.norm == "batch":
                norms.append(torch.nn.BatchNorm1d(ch))
            c_in = ch
        self.convs = torch.nn.ModuleList(convs)
        self.norms = torch.nn.ModuleList(norms) if norms else None
        if mc.ar.kind == "transformer":
            self.gar = _TorchTransformerGar(mc.encoder.d_enc, mc.ar)
        else:
            self.gar = torch.nn.GRU(mc.encoder.d_enc, mc.ar.d_ar,
                                    num_layers=mc.ar.num_layers,
                                    batch_first=True)
        self.heads = torch.nn.Linear(
            mc.ar.d_ar, mc.loss.prediction_steps * mc.encoder.d_enc,
            bias=False)
        self._K = mc.loss.prediction_steps
        self._d_enc = mc.encoder.d_enc

    def forward(self, x):  # x (B, S) float
        h = x[:, None, :]
        for i, conv in enumerate(self.convs):
            h = conv(h)
            if self.norms is not None:
                h = self.norms[i](h)
            h = torch.relu(h)
        z = h.transpose(1, 2)  # (B, T, d_enc)
        if isinstance(self.gar, torch.nn.GRU):
            c, _ = self.gar(z)
        else:
            c = self.gar(z)
        B, T, _ = c.shape
        preds = self.heads(c).reshape(B, T, self._K, self._d_enc)
        return z, c, preds


def prepare_waveform_torch(x: "torch.Tensor", normalize: bool = True,
                           eps: float = 1e-8) -> "torch.Tensor":
    """ops/dsp.py::prepare_waveform, in torch. x int16 or float (B, S)."""
    if x.dtype == torch.int16:
        x = x.to(torch.float32) / 32768.0
    else:
        x = x.to(torch.float32)
    if normalize:
        mean = x.mean(dim=-1, keepdim=True)
        var = x.var(dim=-1, unbiased=False, keepdim=True)  # == jnp.var
        x = (x - mean) / torch.sqrt(var + eps)
    return x


def infonce_torch(preds: "torch.Tensor", z: "torch.Tensor",
                  negatives: str = "same_step"
                  ) -> Tuple["torch.Tensor", np.ndarray]:
    """ops/infonce.py::infonce_loss_and_metrics (single-device jnp path),
    in torch. preds (B, T, K, D), z (B, T, D) -> (loss, acc (K,) numpy)."""
    B, T, K, D = preds.shape
    Tp = T - K
    if Tp <= 0:
        raise ValueError(f"T={T} too short for K={K}")
    preds_v = preds[:, :Tp]  # (B, Tp, K, D)
    if negatives == "same_step":
        # tgt[j, t, k] = z[j, t+k+1]; scores[t, k, i, j]
        tgt = torch.stack([z[:, k + 1:k + 1 + Tp] for k in range(K)], dim=2)
        scores = torch.einsum("itkd,jtkd->tkij", preds_v, tgt)
        labels = torch.arange(B).expand(Tp, K, B)
    elif negatives == "all_steps":
        flat = z.reshape(B * T, D)
        scores = torch.einsum("itkd,nd->tkin", preds_v, flat)
        t_idx = torch.arange(Tp)[:, None, None]
        k_idx = torch.arange(K)[None, :, None]
        i_idx = torch.arange(B)[None, None, :]
        labels = (i_idx * T + (t_idx + k_idx + 1)).expand(Tp, K, B)
    else:
        raise ValueError(f"unknown negatives mode {negatives!r}")
    logp = torch.log_softmax(scores, dim=-1)
    nll = -torch.gather(logp, -1, labels[..., None])[..., 0]
    loss = nll.mean()
    with torch.no_grad():
        correct = (scores.argmax(dim=-1) == labels).float()
        acc = correct.mean(dim=(0, 2)).numpy()  # per k
    return loss, acc


def load_cpc_params_into_torch(variables, cfg: CPCConfig,
                               model: "TorchCPC") -> None:
    """Initialize the torch oracle from CPCModel variables so BOTH trainers
    start at the identical point (interop.to_torch_state_dict's canonical
    names, renamed to this module's attribute paths)."""
    from cpc_tpu.interop import to_torch_state_dict
    sd = to_torch_state_dict(variables, cfg)
    renamed = {}
    for key, v in sd.items():
        key = key.replace("encoder.conv", "convs.")
        key = key.replace("encoder.bn", "norms.")
        if key == "prediction_heads.weight":
            key = "heads.weight"
        renamed[key] = torch.from_numpy(np.array(v, copy=True))
    model.load_state_dict(renamed)


def train_jax(cfg: CPCConfig, variables, batches: List[np.ndarray]
              ) -> List[Dict]:
    """The cpc_tpu side of the comparison: the production make_step_fns
    train step (single device, fp32 on CPU for the parity config), one
    metrics row per step over the SAME batch sequence."""
    import jax.numpy as jnp

    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.train_step import make_step_fns

    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh=None)
    params = variables  # the init shared with the torch side
    opt_state = steps.optimizer.init(params)
    rows = []
    for step, b in enumerate(batches):
        params, opt_state, metrics = steps.train_step(
            params, opt_state, jnp.asarray(b))
        rows.append({"step": step, "loss": float(metrics["loss"]),
                     "acc": np.asarray(metrics["acc"],
                                       np.float64).tolist()})
    return rows


def compare_trajectories(jax_rows: List[Dict], torch_rows: List[Dict],
                         window_frac: float = 0.25) -> Dict:
    """The acceptance numbers: early lockstep (max rel loss diff over the
    first 10 steps, before fp32 reduction-order chaos compounds) and the
    statistical criterion (per-k accuracy averaged over the trailing
    window, |jax - torch| in absolute percentage points; BASELINE.json:5
    demands < 1%)."""
    n = min(len(jax_rows), len(torch_rows))
    jl = np.array([r["loss"] for r in jax_rows[:n]])
    tl = np.array([r["loss"] for r in torch_rows[:n]])
    ja = np.array([r["acc"] for r in jax_rows[:n]])
    ta = np.array([r["acc"] for r in torch_rows[:n]])
    head = slice(0, min(10, n))
    w = max(1, int(n * window_frac))
    acc_j, acc_t = ja[-w:].mean(axis=0), ta[-w:].mean(axis=0)
    return {
        "steps": n,
        "loss_rel_diff_first10": float(np.max(
            np.abs(jl[head] - tl[head]) / np.abs(tl[head]))),
        "loss_rel_diff_window": float(
            abs(jl[-w:].mean() - tl[-w:].mean()) / abs(tl[-w:].mean())),
        "window_steps": w,
        "acc_jax_window": acc_j.round(4).tolist(),
        "acc_torch_window": acc_t.round(4).tolist(),
        "acc_abs_diff_pct": (100 * np.abs(acc_j - acc_t)).round(3).tolist(),
        "acc_abs_diff_max_pct": float(100 * np.max(np.abs(acc_j - acc_t))),
    }


def train_torch(cfg: CPCConfig, model: "TorchCPC",
                batches: List[np.ndarray]) -> List[Dict]:
    """Train the torch oracle over the given int16 batches with Adam at the
    config's hyperparameters; one row per step, metrics at the PRE-update
    params (matching cpc_tpu's train_step, whose value_and_grad reports the
    entering params' loss)."""
    t = cfg.train
    if t.lr_schedule != "constant" or t.weight_decay or t.accum_steps != 1:
        raise ValueError("the torch oracle mirrors the constant-lr Adam "
                         "recipe (optionally with warmup + grad clipping — "
                         "the transformer presets' baked-in recipe) only")
    opt = torch.optim.Adam(model.parameters(), lr=t.learning_rate,
                           betas=(t.beta1, t.beta2), eps=1e-8)
    rows = []
    for step, b in enumerate(batches):
        x = prepare_waveform_torch(torch.from_numpy(np.ascontiguousarray(b)),
                                   normalize=cfg.data.normalize)
        z, c, preds = model(x)
        loss, acc = infonce_torch(preds, z,
                                  negatives=cfg.model.loss.negatives)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        if t.grad_clip_norm:
            # optax.clip_by_global_norm: scale by max_norm/g_norm when
            # g_norm exceeds the bound (torch's 1e-6 denominator eps is the
            # only difference — sub-1e-6 relative)
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           t.grad_clip_norm)
        if t.warmup_steps:
            # optax.linear_schedule(0, lr, warmup) evaluated at the update
            # COUNT (0-based): update k applies lr * min(1, k/warmup)
            scale = min(1.0, step / t.warmup_steps)
            for group in opt.param_groups:
                group["lr"] = t.learning_rate * scale
        opt.step()
        rows.append({"step": step, "loss": float(loss.detach()),
                     "acc": acc.astype(np.float64).tolist()})
    return rows
