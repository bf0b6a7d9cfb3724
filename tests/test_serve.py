"""Serving CLI (cpc_tpu/serve.py): raw PCM on stdin -> float32 feature
frames on stdout, for both the exported-artifact and live-checkpoint
backends. The frames must equal the offline VALID forward (the same
contract StreamingExtractor and the export tests pin)."""

import dataclasses
import io
import json

import jax
import numpy as np
import pytest

from cpc_tpu.config import (ArConfig, EncoderConfig, ModelConfig, presets,
                            to_dict)
from cpc_tpu.eval.streaming import receptive_field
from cpc_tpu.export import export_streaming_step, save_artifact
from cpc_tpu.models.cpc import CPCModel
from cpc_tpu.serve import main as serve_main


def _model():
    cfg = ModelConfig(
        encoder=EncoderConfig(kind="conv1d", channels=(24, 24, 24),
                              kernels=(10, 8, 4), strides=(5, 4, 2),
                              d_enc=24),
        ar=ArConfig(kind="gru", d_ar=16),
    )
    model = CPCModel(cfg)
    params = model.init(jax.random.key(0), np.zeros((1, 2000), np.float32))
    return model, params, cfg


def _save(tmp_path, model, params, cfg, n=4, with_config=True, n_streams=1):
    exp = export_streaming_step(model, params, chunk_latents=n,
                                n_streams=n_streams)
    path = str(tmp_path / "step.shlo")
    meta = None
    if with_config:
        full = dataclasses.replace(presets.by_name("baseline"), model=cfg)
        meta = {"config": to_dict(full)}
    save_artifact(path, exp, meta=meta)
    return path


def _run(argv, pcm: bytes):
    out, err = io.BytesIO(), io.StringIO()
    rc = serve_main(argv, stdin=io.BytesIO(pcm), stdout=out, stderr=err)
    assert rc == 0
    lines = [json.loads(l) for l in err.getvalue().splitlines()]
    return out.getvalue(), lines


def _offline(cfg, params, wave):
    enc = dataclasses.replace(cfg.encoder, padding="VALID")
    vmodel = CPCModel(dataclasses.replace(cfg, encoder=enc,
                                          dtype="float32"))
    z = vmodel.apply(params, wave[None], method=CPCModel.encode)
    c = vmodel.apply(params, z, method=lambda m, z: m.gar(z))
    return np.asarray(z[0]), np.asarray(c[0])


def test_serve_artifact_matches_offline(tmp_path):
    model, params, cfg = _model()
    n = 4
    path = _save(tmp_path, model, params, cfg, n=n)
    rf, down = receptive_field(cfg.encoder.kernels, cfg.encoder.strides)
    W, hop = rf + (n - 1) * down, n * down
    # 4 complete windows + a 17-sample tail the server must drop
    wave = (np.random.default_rng(7).standard_normal(W + 3 * hop + 17)
            .astype(np.float32) * 0.3)
    raw, lines = _run(["--artifact", path, "--emit", "zc",
                       "--chunk-samples", "777"], wave.tobytes())
    d = cfg.encoder.d_enc + cfg.ar.d_ar
    frames = np.frombuffer(raw, "<f4").reshape(-1, d)
    assert frames.shape[0] == 4 * n
    z_off, c_off = _offline(cfg, params, wave[: W + 3 * hop])
    np.testing.assert_allclose(frames[:, : cfg.encoder.d_enc], z_off,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(frames[:, cfg.encoder.d_enc:], c_off,
                               rtol=1e-5, atol=1e-5)
    header, summary = lines[0], lines[-1]
    assert header["frame_dim"] == d
    assert header["frame_stride_samples"] == down
    assert summary["frames"] == 4 * n
    assert summary["dropped_tail_samples"] == rf - down + 17


def test_serve_transformer_artifact_matches_offline(tmp_path):
    """The transformer streaming artifact (explicit KV carry) serves
    through the same CLI: frames == offline VALID forward, and the
    positional-table bound stops the server loudly instead of corrupting
    (the artifact's clamp semantics)."""
    cfg = ModelConfig(
        encoder=EncoderConfig(kind="conv1d", channels=(24, 24, 24),
                              kernels=(10, 8, 4), strides=(5, 4, 2),
                              d_enc=24),
        ar=ArConfig(kind="transformer", d_ar=16, num_heads=2, num_layers=1,
                    max_len=12),
    )
    model = CPCModel(cfg)
    # init under the tiny positional table: 480 samples -> 12 latents
    params = model.init(jax.random.key(0), np.zeros((1, 480), np.float32))
    n = 4
    path = _save(tmp_path, model, params, cfg, n=n)
    rf, down = receptive_field(cfg.encoder.kernels, cfg.encoder.strides)
    W, hop = rf + (n - 1) * down, n * down
    wave = (np.random.default_rng(9).standard_normal(W + 2 * hop + 5)
            .astype(np.float32) * 0.3)
    raw, lines = _run(["--artifact", path, "--emit", "zc",
                       "--chunk-samples", "500"], wave.tobytes())
    d = cfg.encoder.d_enc + cfg.ar.d_ar
    frames = np.frombuffer(raw, "<f4").reshape(-1, d)
    assert frames.shape[0] == 3 * n  # 12 latents = exactly max_len
    z_off, c_off = _offline(cfg, params, wave[: W + 2 * hop])
    np.testing.assert_allclose(frames[:, : cfg.encoder.d_enc], z_off,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(frames[:, cfg.encoder.d_enc:], c_off,
                               rtol=1e-5, atol=1e-5)

    # a 4th window would pass position 12 > max_len: loud stop, not clamp
    long_wave = (np.random.default_rng(10)
                 .standard_normal(W + 3 * hop).astype(np.float32) * 0.3)
    with pytest.raises(SystemExit, match="positional table"):
        serve_main(["--artifact", path],
                   stdin=io.BytesIO(long_wave.tobytes()),
                   stdout=io.BytesIO(), stderr=io.StringIO())


def test_serve_i16_input_exact(tmp_path):
    """i16 stdin decodes as q/32768 exactly — serving the quantized wire
    format must equal the f32 path fed the dequantized samples."""
    model, params, cfg = _model()
    path = _save(tmp_path, model, params, cfg)
    rf, down = receptive_field(cfg.encoder.kernels, cfg.encoder.strides)
    W = rf + 3 * down
    q = np.random.default_rng(11).integers(-3000, 3000, W + 160,
                                           dtype=np.int16)
    raw_i, _ = _run(["--artifact", path, "--in-format", "i16"],
                    q.astype("<i2").tobytes())
    deq = (q.astype(np.float32) / 32768.0).astype("<f4")
    raw_f, _ = _run(["--artifact", path], deq.tobytes())
    assert raw_i == raw_f and len(raw_i) > 0


def test_serve_workdir_equals_artifact(tmp_path):
    """The live-checkpoint backend and an artifact exported from the SAME
    checkpoint must serve identical frames."""
    from cpc_tpu.eval.cli import main as eval_main
    from cpc_tpu.train.cli import main as train_main
    import contextlib

    wd = str(tmp_path / "run")
    train_main(["--config=baseline", "--data=synthetic", f"--workdir={wd}",
                "--steps=1", "--batch-size=8", "--snippet-samples=4000"])
    path = str(tmp_path / "model.stream")
    with contextlib.redirect_stdout(io.StringIO()):
        rc = eval_main([f"--workdir={wd}", f"--export-model={path}",
                        "--export-streaming=4"])
    assert rc == 0
    wave = (np.random.default_rng(3).standard_normal(4000)
            .astype("<f4") * 0.2)
    raw_art, lines_art = _run(["--artifact", path], wave.tobytes())
    raw_live, lines_live = _run(["--workdir", wd], wave.tobytes())
    assert len(raw_art) > 0
    a = np.frombuffer(raw_art, "<f4")
    # the live extractor handles partial windows latent-exactly, so it may
    # emit MORE trailing frames than the fixed-window artifact loop;
    # every frame both emitted must agree
    l = np.frombuffer(raw_live, "<f4")[: a.size]
    np.testing.assert_allclose(a, l, rtol=1e-5, atol=1e-5)
    assert lines_art[0]["frame_dim"] == lines_live[0]["frame_dim"]


def test_serve_info_and_errors(tmp_path):
    model, params, cfg = _model()
    path = _save(tmp_path, model, params, cfg)
    raw, lines = _run(["--artifact", path, "--info", "--emit", "z"], b"")
    assert raw == b"" and lines[0]["frame_dim"] == cfg.encoder.d_enc

    # an extractor artifact is not a streaming step
    from cpc_tpu.export import export_extractor
    epath = str(tmp_path / "extractor.shlo")
    save_artifact(epath, export_extractor(model, params,
                                          snippet_samples=2000))
    with pytest.raises(SystemExit, match="streaming-step"):
        serve_main(["--artifact", epath], stdin=io.BytesIO(b""),
                   stdout=io.BytesIO(), stderr=io.StringIO())

    # missing sidecar config -> actionable error
    bare = _save(tmp_path, model, params, cfg, with_config=False)
    with pytest.raises(SystemExit, match="sidecar|config"):
        serve_main(["--artifact", bare], stdin=io.BytesIO(b""),
                   stdout=io.BytesIO(), stderr=io.StringIO())

    # batched artifacts are for host code, not the one-stream CLI
    two = _save(tmp_path, model, params, cfg, n_streams=2)
    with pytest.raises(SystemExit, match="n_streams=2"):
        serve_main(["--artifact", two], stdin=io.BytesIO(b""),
                   stdout=io.BytesIO(), stderr=io.StringIO())

    # --stats is a workdir-mode flag
    with pytest.raises(SystemExit):
        serve_main(["--artifact", path, "--stats", "0", "1"],
                   stdin=io.BytesIO(b""), stdout=io.BytesIO(),
                   stderr=io.StringIO())
