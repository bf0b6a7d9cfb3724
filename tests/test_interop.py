"""Torch checkpoint interop (SURVEY.md §3 "Snapshots" migration path): the
parity claims are pinned against REAL torch modules — a reference-shaped
torch model's forward must equal CPCModel's forward through the imported
weights, for the plain and the BatchNorm architecture; plus round-trip,
misfit diagnostics, and the CLI → Trainer --resume handoff."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cpc_tpu.config import (ArConfig, CPCConfig, DataConfig, EncoderConfig,
                            LossConfig, ModelConfig, TrainConfig)
from cpc_tpu.interop import (import_checkpoint, params_from_torch,
                             to_torch_state_dict)
from cpc_tpu.models.cpc import CPCModel

CH, KS, ST = (8, 12), (10, 8), (5, 4)
D_ENC, D_AR, K = 12, 10, 3


def _cfg(norm="none"):
    return CPCConfig(
        model=ModelConfig(
            encoder=EncoderConfig(channels=CH, kernels=KS, strides=ST,
                                  d_enc=D_ENC, padding="VALID", norm=norm),
            ar=ArConfig(d_ar=D_AR),
            loss=LossConfig(prediction_steps=K),
        ),
        data=DataConfig(batch_size=8, snippet_samples=2000, prefetch=1),
        train=TrainConfig(num_steps=2, log_every=1000, eval_every=10**9,
                          checkpoint_every=10**9),
    )


class _TorchCPC(torch.nn.Module):
    """The reference architecture (SURVEY.md §A): strided Conv1d pyramid
    (+ optional BatchNorm1d) + ReLU, GRU gar, fused bias-free heads."""

    def __init__(self, bn=False):
        super().__init__()
        convs, norms = [], []
        c_in = 1
        for ch, k, s in zip(CH, KS, ST):
            convs.append(torch.nn.Conv1d(c_in, ch, k, stride=s))
            if bn:
                norms.append(torch.nn.BatchNorm1d(ch))
            c_in = ch
        self.convs = torch.nn.ModuleList(convs)
        self.norms = torch.nn.ModuleList(norms) if bn else None
        self.gar = torch.nn.GRU(D_ENC, D_AR, batch_first=True)
        self.heads = torch.nn.Linear(D_AR, K * D_ENC, bias=False)
        if D_ENC != CH[-1]:
            raise AssertionError("test wiring: d_enc must equal last channel")

    def forward(self, x):  # x (B, T)
        h = x[:, None, :]
        for i, conv in enumerate(self.convs):
            h = conv(h)
            if self.norms is not None:
                h = self.norms[i](h)
            h = torch.relu(h)
        z = h.transpose(1, 2)            # (B, T', d_enc)
        c, _ = self.gar(z)
        B, T, _ = c.shape
        preds = self.heads(c).reshape(B, T, K, D_ENC)
        return z, c, preds


def _forward_parity(bn: bool, rtol=2e-4, atol=2e-5):
    cfg = _cfg(norm="batch" if bn else "none")
    tm = _TorchCPC(bn=bn)
    tm.train(bn)  # train-mode BN = batch-stats math (what we implement)
    x = np.random.default_rng(0).standard_normal((4, 2000)).astype(np.float32)
    with torch.no_grad():
        zt, ct, pt = (a.numpy() for a in tm(torch.from_numpy(x)))

    params = params_from_torch(tm.state_dict(), cfg)
    out = CPCModel(cfg.model).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.z), zt, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.c), ct, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(out.preds), pt, rtol=rtol,
                               atol=atol)


def test_forward_parity_plain():
    _forward_parity(bn=False)


def test_forward_parity_batchnorm():
    _forward_parity(bn=True)


def test_forward_parity_transformer():
    """Transformer-gar forward parity (VERDICT r4 next #7): CPCModel
    weights exported through interop._export_transformer_gar must drive the
    torch mirror (tests/torch_oracle._TorchTransformerGar — explicit
    q/k/v/out Linears, flax-MHA scaling, tanh-gelu, eps=1e-6 LayerNorms) to
    the same z/c/preds."""
    from tests.torch_oracle import TorchCPC, load_cpc_params_into_torch

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, ar=ArConfig(kind="transformer", d_ar=12, num_layers=2,
                               num_heads=3, max_len=128)))
    model = CPCModel(cfg.model)
    variables = model.init(jax.random.key(3),
                           np.zeros((1, 2000), np.float32))
    tm = TorchCPC(cfg)
    load_cpc_params_into_torch(variables, cfg, tm)

    x = np.random.default_rng(4).standard_normal((4, 2000)).astype(np.float32)
    with torch.no_grad():
        zt, ct, pt = (a.numpy() for a in tm(torch.from_numpy(x)))
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.z), zt, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.c), ct, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.preds), pt, rtol=2e-4,
                               atol=2e-5)


def test_forward_parity_multilayer_gru_biasfree_conv():
    """2-layer torch GRU (weight_ih_l1 routing) + bias-free convs (zero-
    bias synthesis) still give forward equality."""
    cfg = _cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, ar=dataclasses.replace(cfg.model.ar, num_layers=2)))

    class _T2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            c_in = 1
            for ch, k, s in zip(CH, KS, ST):
                convs.append(torch.nn.Conv1d(c_in, ch, k, stride=s,
                                             bias=False))
                c_in = ch
            self.convs = torch.nn.ModuleList(convs)
            self.gar = torch.nn.GRU(D_ENC, D_AR, num_layers=2,
                                    batch_first=True)
            self.heads = torch.nn.Linear(D_AR, K * D_ENC, bias=False)

        def forward(self, x):
            h = x[:, None, :]
            for conv in self.convs:
                h = torch.relu(conv(h))
            z = h.transpose(1, 2)
            c, _ = self.gar(z)
            B, T, _ = c.shape
            return z, c, self.heads(c).reshape(B, T, K, D_ENC)

    tm = _T2()
    x = np.random.default_rng(2).standard_normal((4, 2000)).astype(np.float32)
    with torch.no_grad():
        zt, ct, pt = (a.numpy() for a in tm(torch.from_numpy(x)))
    params = params_from_torch(tm.state_dict(), cfg)
    out = CPCModel(cfg.model).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.c), ct, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.preds), pt, rtol=2e-4,
                               atol=2e-5)


def test_separate_head_matrices_import():
    """K separate W_k Linears == the fused head layout, element for element."""
    cfg = _cfg()
    tm = _TorchCPC()
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.startswith("heads.")}
    fused = tm.state_dict()["heads.weight"].numpy()  # (K*d_enc, d_ar)
    for k in range(K):
        sd[f"wk.{k}.weight"] = torch.from_numpy(
            fused[k * D_ENC:(k + 1) * D_ENC])  # (d_enc, d_ar)
    params = params_from_torch(sd, cfg)
    ref = params_from_torch(tm.state_dict(), cfg)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["prediction_heads"]["kernel"]),
        np.asarray(ref["params"]["prediction_heads"]["kernel"]))


def test_roundtrip_torch_export_import():
    cfg = _cfg()
    model = CPCModel(cfg.model)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 2000)))
    sd = to_torch_state_dict(variables, cfg)
    back = params_from_torch(sd, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables, back)
    # and the exported dict LOADS into the reference-shaped torch model
    tm = _TorchCPC(bn=False)
    renamed = {}
    for key, v in sd.items():
        key = key.replace("encoder.conv", "convs.").replace("gar.", "gar.")
        renamed[key] = torch.from_numpy(np.ascontiguousarray(v))
    renamed["heads.weight"] = renamed.pop("prediction_heads.weight")
    tm.load_state_dict(renamed)


def test_mismatch_diagnostics():
    cfg = _cfg()
    tm = _TorchCPC()
    sd = dict(tm.state_dict())
    with pytest.raises(ValueError, match="conv layers"):
        params_from_torch({k: v for k, v in sd.items()
                           if "convs.0" not in k}, cfg)
    with pytest.raises(ValueError, match="heads"):
        bad = dict(sd)
        bad["heads.weight"] = torch.zeros(7, D_AR)
        params_from_torch(bad, cfg)
    with pytest.raises(ValueError, match="norm"):
        # BN weights present but config says norm='none'
        params_from_torch(_TorchCPC(bn=True).state_dict(), cfg)
    with pytest.raises(ValueError, match="nonzero bias"):
        bad = dict(sd)
        del bad["heads.weight"]
        lin = torch.nn.Linear(D_AR, K * D_ENC, bias=True)
        torch.nn.init.ones_(lin.bias)
        bad["heads.weight"], bad["heads.bias"] = lin.weight, lin.bias
        params_from_torch(bad, cfg)
    with pytest.raises(ValueError, match="conv1d"):
        sc = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, encoder=dataclasses.replace(
                cfg.model.encoder, kind="scalogram")))
        params_from_torch(sd, sc)


def test_import_checkpoint_resumes_training(tmp_path):
    """CLI path end to end: torch.save → import_checkpoint → Trainer
    --resume restores the imported weights and trains."""
    from cpc_tpu.data.synthetic import generate_synthetic_corpus
    from cpc_tpu.data.dataset import SnippetDataset
    from cpc_tpu.train.trainer import Trainer

    cfg = _cfg()
    tm = _TorchCPC()
    pt = str(tmp_path / "ref.pt")
    # the common wrapper form {"model": state_dict, ...}
    torch.save({"model": tm.state_dict(), "step": 12345}, pt)
    wd = str(tmp_path / "imported")
    import_checkpoint(pt, cfg, wd)
    assert os.path.isdir(os.path.join(wd, "checkpoints", "0"))
    assert json.load(open(os.path.join(wd, "config.json")))

    corpus = str(tmp_path / "corpus")
    generate_synthetic_corpus(corpus, num_speakers=4, files_per_speaker=2,
                              seconds_per_file=1.0, seed=5)
    tr = Trainer(cfg, SnippetDataset(corpus, 2000), workdir=wd)
    assert tr.maybe_resume() is True and tr.step == 0
    want = params_from_torch(tm.state_dict(), cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), tr.params, want)
    tr.train(1)
    assert tr.step == 1
    tr.close()
