"""bf16 production-stack golden pin (SURVEY.md §5.5; VERDICT r2 next #6).

tests/fixtures/golden.json pins the fp32 jnp stack on CPU; this file pins
the THROUGHPUT stack — bf16 wire, Pallas GRU scan, fused heads+InfoNCE
kernel, Adam — compiled on the real chip, so a Mosaic/XLA numerics
regression fails on the bench host instead of sailing through the CPU
suite.

Run on the TPU host:
    CPC_TPU_TESTS=1 python -m pytest tests/test_golden_tpu.py -q   # check
    python tests/test_golden_tpu.py regen   # after INTENTIONAL changes

Under the normal CPU suite this module skips (the fixture is a property of
the TPU compile chain; interpret-mode kernels are pinned elsewhere).

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


def _compute(steps_n: int = 10):
    import jax
    import jax.numpy as jnp

    from cpc_tpu.config import presets
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.train.train_step import init_state, make_step_fns

    cfg = presets.tpu_fast()
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


def test_bf16_stack_pinned():
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("bf16 production-stack pin is a property of the TPU "
                    "compile chain; run with CPC_TPU_TESTS=1 on the bench "
                    "host")
    assert os.path.exists(_FIXTURE), (
        "fixture missing; run `python tests/test_golden_tpu.py regen` on "
        "the TPU host")
    with open(_FIXTURE) as f:
        want = json.load(f)
    got = _compute(len(want["losses"]))
    np.testing.assert_allclose(got["losses"], want["losses"], rtol=0.02,
                               err_msg="bf16 loss trajectory drifted")
    np.testing.assert_allclose(got["grad_norms"], want["grad_norms"],
                               rtol=0.05,
                               err_msg="bf16 grad-norm trajectory drifted")
    np.testing.assert_allclose(got["final_acc"], want["final_acc"],
                               atol=0.05,
                               err_msg="bf16 k-step accuracies drifted")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        got = _compute()
        os.makedirs(os.path.dirname(_FIXTURE), exist_ok=True)
        with open(_FIXTURE, "w") as f:
            json.dump(got, f, indent=1)
        print(f"wrote {_FIXTURE}")
        print("losses:", [round(x, 4) for x in got["losses"]])
