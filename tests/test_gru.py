"""GRU scan-fusion tests (SURVEY.md §5.1): lax.scan recurrence == hand-rolled
per-step loop, and torch-GRU gate semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from cpc_tpu.models.gru import GRU, gru_reference_loop


def test_scan_equals_step_loop():
    B, T, D, H = 3, 17, 8, 16
    gru = GRU(hidden_size=H)
    x = jax.random.normal(jax.random.key(1), (B, T, D))
    params = gru.init(jax.random.key(0), x)
    out_scan = gru.apply(params, x)
    layer_params = params["params"]["layer0"]
    out_loop = gru_reference_loop(layer_params, x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=1e-6, atol=1e-6)


def test_matches_torch_gru():
    # Parity with the reference's torch.nn.GRU semantics (SURVEY.md §A).
    torch = __import__("torch")
    B, T, D, H = 2, 11, 6, 10
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    tg = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        out_t, _ = tg(torch.from_numpy(x))
    out_t = out_t.numpy()

    # torch packs weight_ih_l0 as (3H, D) in gate order r,z,n; ours is (D, 3H).
    params = {
        "params": {
            "layer0": {
                "wi": jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
                "bi": jnp.asarray(tg.bias_ih_l0.detach().numpy()),
                "wh": jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
                "bh": jnp.asarray(tg.bias_hh_l0.detach().numpy()),
            }
        }
    }
    gru = GRU(hidden_size=H)
    out_j = gru.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-5, atol=1e-5)


def test_multilayer_shapes():
    gru = GRU(hidden_size=32, num_layers=2)
    x = jnp.zeros((2, 9, 16))
    params = gru.init(jax.random.key(0), x)
    out = gru.apply(params, x)
    assert out.shape == (2, 9, 32)
