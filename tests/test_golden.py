"""Golden-file regression (SURVEY.md §5.5): fixed PRNG seed -> serialized
z/c/loss values committed as fixtures. Catches silent numerical drift in the
encoder/gar/loss stack across refactors.

Regenerate after an INTENTIONAL numerics change:
    python tests/test_golden.py regen
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.config import ArConfig, EncoderConfig, LossConfig, ModelConfig
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.ops.infonce import infonce_loss_and_metrics

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.json")


def _compute(padding: str):
    cfg = ModelConfig(
        encoder=EncoderConfig(channels=(16, 24), kernels=(10, 8),
                              strides=(5, 4), d_enc=24, padding=padding),
        ar=ArConfig(d_ar=16),
        loss=LossConfig(prediction_steps=3),
    )
    model = CPCModel(cfg)
    rng = np.random.default_rng(1234)
    x = jnp.asarray(rng.standard_normal((2, 2000)), jnp.float32)
    params = model.init(jax.random.key(42), x)
    out = model.apply(params, x)
    loss, metrics = infonce_loss_and_metrics(out.preds, out.z)
    return {
        "t_latents": int(out.z.shape[1]),
        "z_slice": np.asarray(out.z[0, :4, :4], np.float64).ravel().tolist(),
        "c_slice": np.asarray(out.c[1, -3:, :4], np.float64).ravel().tolist(),
        "preds_slice": np.asarray(out.preds[0, 2, :, :2],
                                  np.float64).ravel().tolist(),
        "loss": float(loss),
        "acc": np.asarray(metrics["acc"], np.float64).tolist(),
    }


def _compute_all():
    # SAME is this repo's default (2000 -> 100 latents here); VALID is the
    # reference's torch-default semantics (2000 -> 98), pinned since round 2
    # (VERDICT r1 #6 — the reference-parity path must have a fixture too).
    return {"same": _compute("SAME"), "valid": _compute("VALID")}


def test_golden_values():
    assert os.path.exists(_FIXTURE), (
        "fixture missing; run `python tests/test_golden.py regen`")
    with open(_FIXTURE) as f:
        want = json.load(f)
    got = _compute_all()
    for mode in want:
        for key in want[mode]:
            np.testing.assert_allclose(
                np.asarray(got[mode][key]), np.asarray(want[mode][key]),
                rtol=2e-5, atol=1e-6,
                err_msg=f"golden mismatch in {mode}/{key}")


def test_valid_padding_reference_shape():
    """The reference semantics (torch-default VALID): 20480 samples -> 126
    latents through the full-scale 160x pyramid (SURVEY.md §8.5 risk 1,
    docs/DESIGN.md). Shape-only via eval_shape — no FLOPs."""
    model = CPCModel(ModelConfig(encoder=EncoderConfig(padding="VALID")))
    var_shapes = jax.eval_shape(model.init, jax.random.key(0),
                                jnp.zeros((1, 20480)))
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x), var_shapes, jnp.zeros((1, 20480)))
    assert out.z.shape == (1, 126, 512)
    # and SAME gives exactly one latent per 160 samples
    model_s = CPCModel(ModelConfig())
    vs = jax.eval_shape(model_s.init, jax.random.key(0),
                        jnp.zeros((1, 20480)))
    out_s = jax.eval_shape(lambda v, x: model_s.apply(v, x), vs,
                           jnp.zeros((1, 20480)))
    assert out_s.z.shape == (1, 128, 512)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(_FIXTURE), exist_ok=True)
        with open(_FIXTURE, "w") as f:
            json.dump(_compute_all(), f, indent=1)
        print(f"wrote {_FIXTURE}")
