"""Streaming extractor (cpc_tpu/eval/streaming.py): chunked push() output
must equal the offline VALID forward of the whole stream, with the GRU
state carried exactly across chunk boundaries (SURVEY.md §4.5)."""

import dataclasses

import jax
import numpy as np
import pytest

from cpc_tpu.config import ArConfig, CPCConfig, DataConfig, EncoderConfig, ModelConfig
from cpc_tpu.eval.streaming import StreamingExtractor, receptive_field
from cpc_tpu.models.cpc import CPCModel


def _model(num_layers=1, ar_kind="gru", enc_kind="conv1d"):
    cfg = ModelConfig(
        encoder=EncoderConfig(kind=enc_kind, channels=(24, 24, 24),
                              kernels=(10, 8, 4), strides=(5, 4, 2),
                              d_enc=24),
        ar=ArConfig(kind=ar_kind, d_ar=16, num_layers=num_layers),
    )
    model = CPCModel(cfg)
    x = np.zeros((1, 2000), np.float32)
    params = model.init(jax.random.key(0), x)
    return model, params, cfg


def _offline_valid(model, params, cfg, wave):
    # same clone the extractor builds: VALID, fp32, lax.scan GRU
    enc = dataclasses.replace(cfg.encoder, padding="VALID", use_pallas=False)
    ar = dataclasses.replace(cfg.ar, use_pallas=False)
    vmodel = CPCModel(dataclasses.replace(cfg, encoder=enc, ar=ar,
                                          dtype="float32"))
    z = vmodel.apply(params, wave[None, :], method=CPCModel.encode)
    c = vmodel.apply(params, z, method=lambda m, z: m.gar(z))
    return np.asarray(z[0]), np.asarray(c[0])


def test_receptive_field_arithmetic():
    rf, down = receptive_field((10, 8, 4, 4, 4), (5, 4, 2, 2, 2))
    assert down == 160
    assert rf == 1 + 9 + 7 * 5 + 3 * 20 + 3 * 40 + 3 * 80  # 465


@pytest.mark.parametrize("num_layers", [1, 2])
def test_streaming_equals_offline(num_layers):
    model, params, cfg = _model(num_layers=num_layers)
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(4321).astype(np.float32) * 0.3

    ex = StreamingExtractor(model, params)
    # ragged chunks, including one too short to emit anything
    cuts = [0, 700, 713, 1500, 2900, 4321]
    zs, cs = [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        z, c = ex.push(wave[a:b])
        zs.append(z)
        cs.append(c)
    z_s = np.concatenate(zs)
    c_s = np.concatenate(cs)

    z_off, c_off = _offline_valid(model, params, cfg, wave)
    # streaming can only emit latents with a COMPLETE receptive field; the
    # offline forward has the same count by the stride arithmetic
    assert z_s.shape == z_off.shape, (z_s.shape, z_off.shape)
    np.testing.assert_allclose(z_s, z_off, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c_s, c_off, rtol=1e-5, atol=1e-5)

    # reset() restarts the stream identically
    ex.reset()
    z2, _ = ex.push(wave)
    np.testing.assert_allclose(z2, z_off, rtol=1e-5, atol=1e-5)


def test_streaming_normalization_stats():
    model, params, cfg = _model()
    rng = np.random.default_rng(4)
    wave = rng.standard_normal(2000).astype(np.float32)
    ex = StreamingExtractor(model, params, stats=(0.1, 2.0))
    z, _ = ex.push(wave)
    z_off, _ = _offline_valid(model, params, cfg, (wave - 0.1) / 2.0)
    np.testing.assert_allclose(z, z_off, rtol=1e-5, atol=1e-5)


def test_streaming_transformer_equals_offline():
    """Transformer gar streams through the KV cache (VERDICT r2 missing
    #6): chunked extend() output == offline forward, exactly."""
    model, params, cfg = _model(ar_kind="transformer")
    rng = np.random.default_rng(7)
    wave = rng.standard_normal(4321).astype(np.float32) * 0.3

    ex = StreamingExtractor(model, params)
    cuts = [0, 700, 713, 1500, 2900, 4321]
    zs, cs = [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        z, c = ex.push(wave[a:b])
        zs.append(z)
        cs.append(c)
    z_s, c_s = np.concatenate(zs), np.concatenate(cs)
    z_off, c_off = _offline_valid(model, params, cfg, wave)
    assert c_s.shape == c_off.shape
    np.testing.assert_allclose(z_s, z_off, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(c_s, c_off, rtol=1e-5, atol=2e-5)

    # reset() restarts the cache; a stream longer than max_len raises at
    # the same point the offline forward would
    ex.reset()
    z2, c2 = ex.push(wave)
    np.testing.assert_allclose(c2, c_off, rtol=1e-5, atol=2e-5)
    small = dataclasses.replace(cfg, ar=dataclasses.replace(
        cfg.ar, max_len=16))
    m_small = CPCModel(small)
    p_small = m_small.init(jax.random.key(0), np.zeros((1, 600), np.float32))
    ex2 = StreamingExtractor(m_small, p_small)
    with pytest.raises(ValueError, match="max_len"):
        ex2.push(wave)  # 107 latents > 16


def test_streaming_flash_trained_checkpoint():
    """A checkpoint whose config says attn_impl='flash' streams through the
    same KV-cache path (the extractor pins its offline twin to the xla impl
    — identical parameters, flax math on both sides of the equality), and
    the result matches the flash offline forward to kernel tolerance."""
    cfg = ModelConfig(
        encoder=EncoderConfig(channels=(16, 24), kernels=(10, 8),
                              strides=(5, 4), d_enc=24),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    attn_impl="flash"),
    )
    model = CPCModel(cfg)
    params = model.init(jax.random.key(0), np.zeros((1, 2000), np.float32))
    rng = np.random.default_rng(11)
    wave = rng.standard_normal(3000).astype(np.float32) * 0.3

    ex = StreamingExtractor(model, params)
    z_s, c_s = ex.push(wave)
    # exact vs the xla-impl offline twin
    xcfg = dataclasses.replace(cfg, ar=dataclasses.replace(
        cfg.ar, attn_impl="xla"))
    z_off, c_off = _offline_valid(CPCModel(xcfg), params, xcfg, wave)
    np.testing.assert_allclose(c_s, c_off, rtol=1e-5, atol=2e-5)
    # and the flash offline forward agrees to kernel tolerance
    _, c_fl = _offline_valid(model, params, cfg, wave)
    np.testing.assert_allclose(c_s, c_fl, rtol=1e-4, atol=1e-4)


def test_streaming_rejects_unsupported_variants():
    # time-axis norm statistics cannot stream
    cfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 8), kernels=(10, 8),
                              strides=(5, 4), d_enc=8, norm="group"),
        ar=ArConfig(d_ar=8))
    m2 = CPCModel(cfg)
    p2 = m2.init(jax.random.key(0), np.zeros((1, 400), np.float32))
    with pytest.raises(ValueError, match="time axis"):
        StreamingExtractor(m2, p2)


def test_streaming_bf16_model_streams_in_fp32():
    """A bf16 + Pallas-GRU training config streams exactly: the extractor's
    fp32 lax.scan clone is chunk-associative regardless of training dtype."""
    cfg = ModelConfig(
        encoder=EncoderConfig(channels=(16, 16), kernels=(10, 8),
                              strides=(5, 4), d_enc=16),
        ar=ArConfig(d_ar=8, use_pallas=True),
        dtype="bfloat16")
    model = CPCModel(cfg)
    wave = np.random.default_rng(5).standard_normal(3000).astype(np.float32)
    params = model.init(jax.random.key(2), wave[None, :])
    ex = StreamingExtractor(model, params)
    zs, cs = [], []
    for a, b in [(0, 900), (900, 1777), (1777, 3000)]:
        z, c = ex.push(wave[a:b])
        zs.append(z); cs.append(c)
    z_off, c_off = _offline_valid(model, params, cfg, wave)
    np.testing.assert_allclose(np.concatenate(zs), z_off, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(cs), c_off, rtol=1e-5, atol=1e-5)
    assert zs[0].dtype == np.float32


def test_gru_state_carry_matches_full_run():
    """The return_state hook itself: two half-sequences with carried state
    == one full run (multi-layer)."""
    import jax.numpy as jnp
    from cpc_tpu.models.gru import GRU
    gru = GRU(hidden_size=8, num_layers=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 6)),
                    jnp.float32)
    params = gru.init(jax.random.key(1), x)
    full = gru.apply(params, x)
    a, ha = gru.apply(params, x[:, :5], None, True)
    b, _ = gru.apply(params, x[:, 5:], ha, True)
    np.testing.assert_allclose(np.concatenate([a, b], axis=1), full,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ar_kind", ["gru", "transformer"])
def test_batched_streams_equal_offline(ar_kind):
    """n_streams > 1 (batched serving): every stream's chunked output must
    equal its own offline forward — states/caches never cross streams."""
    model, params, cfg = _model(ar_kind=ar_kind)
    rng = np.random.default_rng(9)
    waves = rng.standard_normal((3, 4000)).astype(np.float32) * 0.3

    ex = StreamingExtractor(model, params, n_streams=3)
    cuts = [0, 900, 2100, 4000]
    zs, cs = [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        z, c = ex.push(waves[:, a:b])
        zs.append(z)
        cs.append(c)
    z_s = np.concatenate(zs, axis=1)
    c_s = np.concatenate(cs, axis=1)
    for i in range(3):
        z_off, c_off = _offline_valid(model, params, cfg, waves[i])
        np.testing.assert_allclose(z_s[i], z_off, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(c_s[i], c_off, rtol=1e-5, atol=2e-5)

    with pytest.raises(ValueError, match="chunk must be"):
        ex.push(waves[:2, :100])


def test_reset_stream_recycles_one_row():
    """reset_stream(i): the recycled row behaves exactly as a FRESH
    extractor fed zeros(len(residual)) + the subsequent chunks (the
    documented lockstep semantic), and the OTHER rows are bit-identical
    to a run that never reset."""
    model, params, cfg = _model()
    rng = np.random.default_rng(11)
    waves = rng.standard_normal((3, 4000)).astype(np.float32) * 0.3
    new_wave = rng.standard_normal(2100).astype(np.float32) * 0.3
    cuts = [0, 900, 1900]          # pushes before the reset
    cuts2 = [1900, 2800, 4000]     # pushes after

    # reference run: no reset
    ref = StreamingExtractor(model, params, n_streams=3)
    ref_out = [ref.push(waves[:, a:b])
               for a, b in zip([0, 900, 1900], [900, 1900, 2800])]
    ref_out.append(ref.push(waves[:, 2800:4000]))

    ex = StreamingExtractor(model, params, n_streams=3)
    for a, b in zip(cuts[:-1], cuts[1:]):
        ex.push(waves[:, a:b])
    resid_len = ex._resid.shape[1]
    ex.reset_stream(1)
    post = []
    stream1_feed = []
    for a, b in zip(cuts2[:-1], cuts2[1:]):
        chunk = waves[:, a:b].copy()
        chunk[1] = new_wave[a - 1900:b - 1900]   # row 1 is a NEW stream
        stream1_feed.append(chunk[1])
        post.append(ex.push(chunk))

    # rows 0 and 2: identical to the never-reset run
    for k, (z, c) in enumerate(post):
        z_ref, c_ref = ref_out[2 + k]
        for row in (0, 2):
            np.testing.assert_array_equal(z[row], z_ref[row])
            np.testing.assert_array_equal(c[row], c_ref[row])

    # row 1: equals a fresh extractor fed zeros(resid_len) + the new feed
    fresh = StreamingExtractor(model, params, n_streams=1)
    fz, fc = [], []
    first = np.concatenate([np.zeros(resid_len, np.float32),
                            stream1_feed[0]])
    for chunk in [first] + stream1_feed[1:]:
        z, c = fresh.push(chunk)
        fz.append(z)
        fc.append(c)
    np.testing.assert_allclose(
        np.concatenate([p[0][1] for p in post], axis=0),
        np.concatenate(fz, axis=0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.concatenate([p[1][1] for p in post], axis=0),
        np.concatenate(fc, axis=0), rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="out of range"):
        ex.reset_stream(3)


def test_reset_stream_transformer_recycles_one_row():
    """Transformer per-stream reset (VERDICT r3 next #7): the carry's
    per-stream position vector lets ONE batch row restart at position 0
    while the other row's KV trajectory continues untouched — the exact
    semantics the GRU test above pins, now for the transformer gar."""
    model, params, cfg = _model(ar_kind="transformer")
    rng = np.random.default_rng(13)
    waves = rng.standard_normal((2, 4000)).astype(np.float32) * 0.3
    new_wave = rng.standard_normal(2100).astype(np.float32) * 0.3

    ref = StreamingExtractor(model, params, n_streams=2)
    ref_out = [ref.push(waves[:, a:b])
               for a, b in zip([0, 900, 1900, 2800], [900, 1900, 2800,
                                                      4000])]

    ex = StreamingExtractor(model, params, n_streams=2)
    for a, b in zip([0, 900], [900, 1900]):
        ex.push(waves[:, a:b])
    resid_len = ex._resid.shape[1]
    ex.reset_stream(1)
    post, stream1_feed = [], []
    for a, b in zip([1900, 2800], [2800, 4000]):
        chunk = waves[:, a:b].copy()
        chunk[1] = new_wave[a - 1900:b - 1900]   # row 1 is a NEW stream
        stream1_feed.append(chunk[1])
        post.append(ex.push(chunk))

    # row 0: identical to the never-reset run
    for k, (z, c) in enumerate(post):
        z_ref, c_ref = ref_out[2 + k]
        np.testing.assert_array_equal(z[0], z_ref[0])
        np.testing.assert_array_equal(c[0], c_ref[0])

    # row 1: equals a fresh extractor fed zeros(resid_len) + the new feed
    fresh = StreamingExtractor(model, params, n_streams=1)
    fz, fc = [], []
    first = np.concatenate([np.zeros(resid_len, np.float32),
                            stream1_feed[0]])
    for chunk in [first] + stream1_feed[1:]:
        z, c = fresh.push(chunk)
        fz.append(z)
        fc.append(c)
    np.testing.assert_allclose(
        np.concatenate([p[0][1] for p in post], axis=0),
        np.concatenate(fz, axis=0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.concatenate([p[1][1] for p in post], axis=0),
        np.concatenate(fc, axis=0), rtol=1e-6, atol=1e-6)
