"""bf16 production-stack golden pins (SURVEY.md §5.5; VERDICT r2 next #6,
r3 next #4b).

tests/fixtures/golden.json pins the fp32 jnp stack on CPU; this file pins
the THROUGHPUT stacks — bf16 wire, Pallas kernels where the config enables
them, Adam — compiled on the real chip, so a Mosaic/XLA numerics
regression fails on the bench host instead of sailing through the CPU
suite. All THREE model families that headline the BENCH artifact are
pinned (r3 covered only conv+GRU; the scalogram and transformer stacks
exercise disjoint compile paths — 2-D convs + rFFT, attention — that the
tpu_fast pin cannot see):

  * tpu_fast          conv1d + Pallas GRU + fused heads+InfoNCE
  * scalogram_fast    on-device scalogram + 2-D conv encoder
  * transformer_fast  causal transformer gar (XLA attention)

Run on the TPU host:
    CPC_TPU_TESTS=1 python -m pytest tests/test_golden_tpu.py -q   # check
    python tests/test_golden_tpu.py regen [family ...]   # after
        INTENTIONAL numerics changes (default: every family)

Under the normal CPU suite this module skips (the fixtures are a property
of the TPU compile chain; interpret-mode kernels are pinned elsewhere).

Tolerance: the compiled step is deterministic run-to-run on one chip; the
band (2% on loss/metrics) absorbs compiler-version drift in bf16 fusion
choices while still catching real numerics breaks (a gate-math or
LSE regression moves the 10-step loss trajectory far more than 2%).
"""

import json
import os
import sys

import numpy as np

# direct-script regen runs with tests/ as sys.path[0]; make the repo root
# importable (pytest gets this from conftest)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_tpu_bf16.json")
FAMILIES = ("tpu_fast", "scalogram_fast", "transformer_fast")


def _compute(preset_name: str, steps_n: int = 10):
    import jax  # noqa: F401  (backend must be up before flax tracing)
    import jax.numpy as jnp

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = presets.by_name(preset_name)
    model = CPCModel(cfg.model)
    steps = make_step_fns(cfg, model, mesh=None)
    params, opt_state = init_state(cfg, model, steps.optimizer)
    rng = np.random.default_rng(20260817)
    batch = jnp.asarray(np.clip(rng.standard_normal(
        (cfg.data.batch_size, cfg.data.snippet_samples)) * 6000,
        -32768, 32767).astype(np.int16))
    losses, grads = [], []
    metrics = {}
    for _ in range(steps_n):
        params, opt_state, metrics = steps.train_step(params, opt_state,
                                                      batch)
        losses.append(float(metrics["loss"]))
        grads.append(float(metrics["grad_norm"]))
    return {
        "losses": losses,
        "grad_norms": grads,
        "final_acc": np.asarray(metrics["acc"], np.float64).tolist(),
    }


def _load_fixture() -> dict:
    with open(_FIXTURE) as f:
        data = json.load(f)
    if "losses" in data:  # r3 single-family layout
        data = {"tpu_fast": data}
    return data


def _check_family(family: str) -> None:
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("bf16 production-stack pin is a property of the TPU "
                    "compile chain; run with CPC_TPU_TESTS=1 on the bench "
                    "host")
    assert os.path.exists(_FIXTURE), (
        "fixture missing; run `python tests/test_golden_tpu.py regen` on "
        "the TPU host")
    fixture = _load_fixture()
    assert family in fixture, (
        f"no {family!r} entry in the fixture; run "
        f"`python tests/test_golden_tpu.py regen {family}` on the TPU host")
    want = fixture[family]
    got = _compute(family, len(want["losses"]))
    np.testing.assert_allclose(got["losses"], want["losses"], rtol=0.02,
                               err_msg=f"{family}: bf16 loss trajectory "
                                       "drifted")
    np.testing.assert_allclose(got["grad_norms"], want["grad_norms"],
                               rtol=0.05,
                               err_msg=f"{family}: bf16 grad-norm "
                                       "trajectory drifted")
    np.testing.assert_allclose(got["final_acc"], want["final_acc"],
                               atol=0.05,
                               err_msg=f"{family}: bf16 k-step accuracies "
                                       "drifted")


def test_bf16_stack_pinned():
    _check_family("tpu_fast")


def test_bf16_scalogram_pinned():
    _check_family("scalogram_fast")


def test_bf16_transformer_pinned():
    _check_family("transformer_fast")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        todo = sys.argv[2:] or FAMILIES
        fixture = _load_fixture() if os.path.exists(_FIXTURE) else {}
        for family in todo:
            assert family in FAMILIES, f"unknown family {family!r}"
            fixture[family] = _compute(family)
            print(f"{family} losses:",
                  [round(x, 4) for x in fixture[family]["losses"]])
        os.makedirs(os.path.dirname(_FIXTURE), exist_ok=True)
        with open(_FIXTURE, "w") as f:
            json.dump(fixture, f, indent=1)
        print(f"wrote {_FIXTURE}")
