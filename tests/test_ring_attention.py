"""Context-parallel (ring) causal attention: equality against the
single-device oracles on the 8-virtual-device CPU mesh (SURVEY.md §5.3
distributed-without-cluster strategy; ops/attention_ring.py).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cpc_tpu.config import ArConfig
from cpc_tpu.models.transformer import CausalTransformer
from cpc_tpu.ops.attention_ring import ring_causal_mha
from cpc_tpu.parallel.cp import cp_transformer_apply
from cpc_tpu.parallel.mesh import make_mesh
from tests.oracles import ref_causal_mha as _ref_causal_mha, qkv as _base_qkv


def _qkv(T, B=2, H=2, Dh=8, seed=0):
    return _base_qkv(T, B=B, H=H, Dh=Dh, seed=seed)


def _ring_global(q, k, v, mesh, axis="ctx"):
    """Run the ring op under shard_map on global arrays, return global out."""
    fn = functools.partial(ring_causal_mha, axis_name=axis)
    spec = P(None, axis, None, None)
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                 out_specs=spec))(q, k, v)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,), ("ctx",))


@pytest.mark.parametrize("T", [64, 256])
def test_ring_forward_matches_reference(mesh, T):
    q, k, v = _qkv(T)
    got = _ring_global(q, k, v, mesh)
    want = _ref_causal_mha(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_gradients_match_reference(mesh):
    T = 128
    q, k, v = _qkv(T, seed=1)
    w = jnp.asarray(np.random.default_rng(2).standard_normal(q.shape),
                    jnp.float32)

    def f_ring(q, k, v):
        return jnp.sum(_ring_global(q, k, v, mesh) * w)

    def f_ref(q, k, v):
        return jnp.sum(_ref_causal_mha(q, k, v) * w)

    g_ring = jax.grad(f_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5,
                                   err_msg=f"d{name}")


def _cfg(T, impl="ring"):
    return ArConfig(kind="transformer", d_ar=32, num_layers=2, num_heads=4,
                    max_len=T, attn_impl=impl)


def test_cp_transformer_equals_single_device(mesh):
    """Full gar under shard_map (params replicated, z T-sharded, positions
    globally offset, ring attention) == the plain single-device forward."""
    T = 8 * 16
    z = jnp.asarray(np.random.default_rng(3).standard_normal((2, T, 24)),
                    jnp.float32)
    m_ref = CausalTransformer(_cfg(T, "xla"))
    params = m_ref.init(jax.random.PRNGKey(0), z)
    want = m_ref.apply(params, z)
    got = cp_transformer_apply(_cfg(T), params, z, mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cp_transformer_param_grads_match(mesh):
    """Gradients w.r.t. the REPLICATED parameter tree through the T-sharded
    apply equal the single-device gradients (shard_map psums the replicated
    params' cotangents itself)."""
    T = 8 * 8
    z = jnp.asarray(np.random.default_rng(4).standard_normal((2, T, 24)),
                    jnp.float32)
    m_ref = CausalTransformer(_cfg(T, "xla"))
    params = m_ref.init(jax.random.PRNGKey(1), z)

    g_ref = jax.grad(lambda p: jnp.sum(jnp.tanh(m_ref.apply(p, z))))(params)
    g_cp = jax.grad(lambda p: jnp.sum(jnp.tanh(
        cp_transformer_apply(_cfg(T), p, z, mesh=mesh))))(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_c, _ = jax.tree_util.tree_flatten(g_cp)
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_cp_validation(mesh):
    T = 8 * 4
    z = jnp.zeros((1, T + 1, 24), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        cp_transformer_apply(_cfg(T), {}, z, mesh=mesh)
    # decode_step needs the explicit-projection blocks: an 'xla'-impl
    # model (flax MHA) must refuse with the carry_decode_model pointer,
    # not fail deep inside flax (the r4 cache-as-carry replacement for the
    # old decode=True flag this test used to pin)
    from cpc_tpu.models.transformer import decode_carry
    m_xla = CausalTransformer(_cfg(64, "xla"))
    p_xla = m_xla.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 32), jnp.float32))
    carry = decode_carry(_cfg(64, "xla"), n_streams=1)
    with pytest.raises(ValueError, match="q/k/v"):
        m_xla.apply(p_xla, jnp.zeros((1, 32), jnp.float32), carry,
                    method=m_xla.decode_step)
    # plain (non-shard_map) apply of a ring-impl config must fail with an
    # actionable error, not an unbound-axis trace error
    m_ring = CausalTransformer(_cfg(64))
    z64 = jnp.zeros((1, 64, 24), jnp.float32)
    with pytest.raises(ValueError, match="shard_map"):
        m_ring.init(jax.random.PRNGKey(0), z64)
    # max_len guards the GLOBAL sequence, not the local shard: a 128-long
    # sequence is only 16 per shard, but the table holds 64 positions
    m = CausalTransformer(_cfg(64, "xla"))
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 24), jnp.float32))
    with pytest.raises(ValueError, match="global sequence"):
        cp_transformer_apply(_cfg(64), params,
                             jnp.zeros((1, 128, 24), jnp.float32), mesh=mesh)


# --- context-parallel loss: time-sharded all-steps InfoNCE ----------------

def _ctx_loss_global(preds, z, mesh, axis="ctx"):
    from cpc_tpu.ops.infonce_ring import ring_infonce_allsteps_ctx
    fn = functools.partial(ring_infonce_allsteps_ctx, axis_name=axis)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None)),
        out_specs=(P(), P())))(preds, z)


def test_ctx_ring_infonce_equals_allsteps(mesh):
    """Time-sharded ring pool == the gathered all_steps reference: loss,
    per-k accuracy, and gradients."""
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    B, T, K, D = 3, 8 * 6, 4, 16
    r = np.random.default_rng(0)
    preds = jnp.asarray(r.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(r.standard_normal((B, T, D)), jnp.float32)

    want_loss, want_m = infonce_loss_and_metrics(preds, z,
                                                 negatives="all_steps")
    got_loss, got_m = _ctx_loss_global(preds, z, mesh)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_m["acc"], want_m["acc"], rtol=0, atol=0)

    g_want = jax.grad(lambda p, zz: infonce_loss_and_metrics(
        p, zz, negatives="all_steps")[0], argnums=(0, 1))(preds, z)
    g_got = jax.grad(lambda p, zz: _ctx_loss_global(p, zz, mesh)[0],
                     argnums=(0, 1))(preds, z)
    for a, b, name in zip(g_got, g_want, ("dpreds", "dz")):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)


def test_cp_cpc_loss_equals_single_device(mesh):
    """gar (ring attention) + heads + time-sharded all-steps InfoNCE ==
    the single-device CPC loss path, values AND parameter gradients."""
    from cpc_tpu.config import EncoderConfig, LossConfig, ModelConfig
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.parallel.cp import cp_cpc_loss_and_metrics

    T = 8 * 8
    mcfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T),
        loss=LossConfig(prediction_steps=3, negatives="all_steps"))
    model = CPCModel(mcfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    z = model.apply(params, x, method=CPCModel.encode)
    assert z.shape[1] == T

    def ref_loss(p):
        out = model.apply(p, x)
        return infonce_loss_and_metrics(out.preds, out.z,
                                        negatives="all_steps")[0]

    def cp_loss(p):
        zz = model.apply(p, x, method=CPCModel.encode)
        return cp_cpc_loss_and_metrics(mcfg, p, zz, mesh=mesh)[0]

    np.testing.assert_allclose(cp_loss(params), ref_loss(params),
                               rtol=1e-5, atol=1e-6)
    g_ref = jax.grad(ref_loss)(params)
    g_cp = jax.grad(cp_loss)(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_c, _ = jax.tree_util.tree_flatten(g_cp)
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


# --- CP end-to-end from raw audio: halo-exchange encoder ------------------

@pytest.mark.parametrize("norm", ["none", "layer", "group", "batch"])
def test_cp_encoder_equals_single_device(mesh, norm):
    """Per-layer halo exchange == the global SAME forward for every norm
    option (LayerNorm is per-position; GroupNorm spans T and combines
    stats via axis_name; batch-stats norm psums over the shards)."""
    from cpc_tpu.config import EncoderConfig
    from cpc_tpu.models.encoder import ConvEncoder

    cfg = EncoderConfig(channels=(8, 12, 16), kernels=(10, 8, 4),
                        strides=(5, 4, 2), d_enc=16, norm=norm)
    enc, enc_cp = ConvEncoder(cfg), ConvEncoder(cfg, cp_axis="ctx")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8 * 40 * 4)),
                    jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    run = jax.jit(jax.shard_map(
        lambda p, xx: enc_cp.apply(p, xx), mesh=mesh,
        in_specs=(P(), P(None, "ctx")), out_specs=P(None, "ctx", None)))
    np.testing.assert_allclose(run(params, x), enc.apply(params, x),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda p: jnp.sum(jnp.tanh(enc.apply(p, x))))(params)
    g_cp = jax.grad(lambda p: jnp.sum(jnp.tanh(run(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_cp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_cp_loss_from_audio_equals_single_device(mesh):
    """Raw waveform in, loss out — every activation T-sharded (halo-exchange
    encoder, ring attention, ctx-ring InfoNCE) == single-device, values AND
    parameter gradients."""
    from cpc_tpu.config import EncoderConfig, LossConfig, ModelConfig
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.parallel.cp import cp_cpc_loss_from_audio

    T = 8 * 8
    mcfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T),
        loss=LossConfig(prediction_steps=3, negatives="all_steps"))
    model = CPCModel(mcfg)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x)

    def ref_loss(p):
        out = model.apply(p, x)
        return infonce_loss_and_metrics(out.preds, out.z,
                                        negatives="all_steps")[0]

    def cp_loss(p):
        return cp_cpc_loss_from_audio(mcfg, p, x, mesh=mesh)[0]

    np.testing.assert_allclose(cp_loss(params), ref_loss(params),
                               rtol=1e-5, atol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(jax.grad(ref_loss)(params))
    flat_c, _ = jax.tree_util.tree_flatten(jax.grad(cp_loss)(params))
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


# --- zig-zag (load-balanced) ring attention --------------------------------

def _zigzag_global(q, k, v, mesh, axis="ctx"):
    from cpc_tpu.ops.attention_zigzag import zigzag_causal_mha
    fn = functools.partial(zigzag_causal_mha, axis_name=axis)
    spec = P(None, axis, None, None)
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                 out_specs=spec))(q, k, v)


@pytest.mark.parametrize("T", [16, 64, 256])
def test_zigzag_forward_matches_reference(mesh, T):
    """Balanced schedule (own pair + 2 full tiles/step, internal relayout)
    == the single-device causal oracle, including the T_loc=2 edge where
    every device holds exactly its two chunks and the scan does all the
    work (T=16 on the 8-device mesh)."""
    q, k, v = _qkv(T)
    got = _zigzag_global(q, k, v, mesh)
    want = _ref_causal_mha(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_zigzag_gradients_match_reference(mesh):
    T = 128
    q, k, v = _qkv(T, seed=31)
    w = jnp.asarray(np.random.default_rng(32).standard_normal(q.shape),
                    jnp.float32)

    def f_zz(q, k, v):
        return jnp.sum(_zigzag_global(q, k, v, mesh) * w)

    def f_ref(q, k, v):
        return jnp.sum(_ref_causal_mha(q, k, v) * w)

    g_zz = jax.grad(f_zz, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_zz, g_ref, "qkv"):
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("R", [3, 5])
def test_zigzag_odd_ring_sizes(R):
    """The zig-zag chunk/permutation math holds for ODD ring sizes too
    (2R chunks, parity-based slot assembly) — pinned here on 3- and
    5-device sub-meshes, fwd + grads."""
    sub = make_mesh((R,), ("ctx",), devices=jax.devices()[:R])
    T = R * 2 * 4
    q, k, v = _qkv(T, seed=41 + R)
    got = _zigzag_global(q, k, v, sub)
    want = _ref_causal_mha(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    w = jnp.asarray(np.random.default_rng(43).standard_normal(q.shape),
                    jnp.float32)
    g = jax.grad(lambda a, b, c: jnp.sum(
        _zigzag_global(a, b, c, sub) * w), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(
        _ref_causal_mha(a, b, c) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5,
                                   err_msg=f"d{name}")


def test_zigzag_on_2d_mesh_and_validation():
    """zigzag under a (data, ctx) mesh (batch also sharded) == oracle; odd
    per-device T raises with the actionable message."""
    from cpc_tpu.ops.attention_zigzag import zigzag_causal_mha

    mesh2 = make_mesh((2, 4), ("data", "ctx"))
    T = 4 * 8
    q, k, v = _qkv(T, B=4, seed=33)
    fn = functools.partial(zigzag_causal_mha, axis_name="ctx")
    spec = P("data", "ctx", None, None)
    got = jax.jit(jax.shard_map(fn, mesh=mesh2, in_specs=(spec,) * 3,
                                out_specs=spec))(q, k, v)
    np.testing.assert_allclose(got, _ref_causal_mha(q, k, v),
                               rtol=2e-5, atol=2e-5)

    mesh1 = make_mesh((-1,), ("ctx",))
    q3, k3, v3 = _qkv(8 * 3, seed=34)  # T_loc = 3, odd
    with pytest.raises(ValueError, match="even per-device T"):
        _zigzag_global(q3, k3, v3, mesh1)


def test_zigzag_cp_loss_from_audio_equals_single_device(mesh):
    """ar.attn_impl='zigzag' rides the whole CP path (cp.py preserves it):
    audio -> halo encoder -> zig-zag gar -> ctx-ring InfoNCE == the
    single-device loss, values AND parameter gradients."""
    import dataclasses

    from cpc_tpu.config import EncoderConfig, LossConfig, ModelConfig
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.parallel.cp import cp_cpc_loss_from_audio

    T = 8 * 8
    mcfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T, attn_impl="zigzag"),
        loss=LossConfig(prediction_steps=3, negatives="all_steps"))
    # the reference forward uses the same config with plain attention
    mcfg_ref = ModelConfig(
        encoder=mcfg.encoder,
        ar=dataclasses.replace(mcfg.ar, attn_impl="xla"),
        loss=mcfg.loss)
    model = CPCModel(mcfg_ref)
    x = jnp.asarray(np.random.default_rng(37).standard_normal((2, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(7), x)

    def ref_loss(p):
        out = model.apply(p, x)
        return infonce_loss_and_metrics(out.preds, out.z,
                                        negatives="all_steps")[0]

    def zz_loss(p):
        return cp_cpc_loss_from_audio(mcfg, p, x, mesh=mesh)[0]

    np.testing.assert_allclose(zz_loss(params), ref_loss(params),
                               rtol=1e-5, atol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(jax.grad(ref_loss)(params))
    flat_c, _ = jax.tree_util.tree_flatten(jax.grad(zz_loss)(params))
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


# --- 2-D DP x CP: batch AND time sharded, one flattened InfoNCE ring -------

def _mesh2d(shape=(2, 4)):
    return make_mesh(shape, ("data", "ctx"))


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_dp_ctx_ring_infonce_equals_allsteps(shape):
    """(data, ctx)-tiled ring pool == the gathered all_steps reference on
    the GLOBAL batch: loss, per-k accuracy, and both gradients — for both
    2-D mesh aspect ratios."""
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.ops.infonce_ring import ring_infonce_allsteps_ctx

    mesh2 = _mesh2d(shape)
    B, T, K, D = 2 * shape[0], shape[1] * 6, 3, 16
    r = np.random.default_rng(11)
    preds = jnp.asarray(r.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(r.standard_normal((B, T, D)), jnp.float32)

    fn = functools.partial(ring_infonce_allsteps_ctx, axis_name="ctx",
                           data_axis="data")
    run = jax.jit(jax.shard_map(
        fn, mesh=mesh2,
        in_specs=(P("data", "ctx", None, None), P("data", "ctx", None)),
        out_specs=(P(), P())))

    want_loss, want_m = infonce_loss_and_metrics(preds, z,
                                                 negatives="all_steps")
    got_loss, got_m = run(preds, z)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_m["acc"], want_m["acc"], rtol=0, atol=0)

    g_want = jax.grad(lambda p, zz: infonce_loss_and_metrics(
        p, zz, negatives="all_steps")[0], argnums=(0, 1))(preds, z)
    g_got = jax.grad(lambda p, zz: run(p, zz)[0], argnums=(0, 1))(preds, z)
    for a, b, name in zip(g_got, g_want, ("dpreds", "dz")):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)


def test_dp_ctx_ring_infonce_all_invalid_shards():
    """Edge case: T_loc <= K, so the TRAILING ctx devices hold zero valid
    prediction rows (every local row is a masked -1 filler). The global
    psum denominators must still be right and loss/grads equal the
    gathered reference."""
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.ops.infonce_ring import ring_infonce_allsteps_ctx

    mesh2 = _mesh2d((2, 4))
    B, T, K, D = 4, 8, 3, 8  # T_loc=2: ctx device 3 fully invalid
    r = np.random.default_rng(23)
    preds = jnp.asarray(r.standard_normal((B, T, K, D)), jnp.float32)
    z = jnp.asarray(r.standard_normal((B, T, D)), jnp.float32)
    run = jax.jit(jax.shard_map(
        functools.partial(ring_infonce_allsteps_ctx, axis_name="ctx",
                          data_axis="data"),
        mesh=mesh2,
        in_specs=(P("data", "ctx", None, None), P("data", "ctx", None)),
        out_specs=(P(), P())))
    want_loss, _ = infonce_loss_and_metrics(preds, z, negatives="all_steps")
    got_loss, _ = run(preds, z)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, atol=1e-6)
    g_want = jax.grad(lambda p, zz: infonce_loss_and_metrics(
        p, zz, negatives="all_steps")[0], argnums=(0, 1))(preds, z)
    g_got = jax.grad(lambda p, zz: run(p, zz)[0], argnums=(0, 1))(preds, z)
    for a, b, name in zip(g_got, g_want, ("dpreds", "dz")):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("impl", ["ring", "zigzag"])
def test_dp_cp_loss_from_audio_equals_single_device(impl):
    """Raw waveform in, loss out, on the 2-D (data, ctx) mesh: halo-exchange
    encoder + ring/zig-zag attention per data row + the flattened-ring
    InfoNCE == the single-device loss on the GLOBAL batch, values AND
    param grads — the two features compose."""
    from cpc_tpu.config import EncoderConfig, LossConfig, ModelConfig
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.parallel.cp import cp_cpc_loss_from_audio

    mesh2 = _mesh2d((2, 4))
    T = 4 * 8
    mcfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T, attn_impl=impl),
        loss=LossConfig(prediction_steps=3, negatives="all_steps"))
    model = CPCModel(dataclasses.replace(
        mcfg, ar=dataclasses.replace(mcfg.ar, attn_impl="xla")))
    x = jnp.asarray(np.random.default_rng(13).standard_normal((4, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(4), x)

    def ref_loss(p):
        out = model.apply(p, x)
        return infonce_loss_and_metrics(out.preds, out.z,
                                        negatives="all_steps")[0]

    def dpcp_loss(p):
        return cp_cpc_loss_from_audio(mcfg, p, x, mesh=mesh2, axis="ctx",
                                      dp_axis="data")[0]

    np.testing.assert_allclose(dpcp_loss(params), ref_loss(params),
                               rtol=1e-5, atol=1e-6)
    flat_r, _ = jax.tree_util.tree_flatten(jax.grad(ref_loss)(params))
    flat_c, _ = jax.tree_util.tree_flatten(jax.grad(dpcp_loss)(params))
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_dp_cp_transformer_apply_and_validation():
    """cp_transformer_apply with dp_axis: batch-and-time-sharded forward ==
    single-device; bad dp axes raise actionable errors."""
    from cpc_tpu.parallel.cp import cp_cpc_loss_and_metrics

    mesh2 = _mesh2d((2, 4))
    T = 4 * 16
    z = jnp.asarray(np.random.default_rng(17).standard_normal((4, T, 24)),
                    jnp.float32)
    m_ref = CausalTransformer(_cfg(T, "xla"))
    params = m_ref.init(jax.random.PRNGKey(5), z)
    want = m_ref.apply(params, z)
    got = cp_transformer_apply(_cfg(T), params, z, mesh=mesh2, axis="ctx",
                               dp_axis="data")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    with pytest.raises(ValueError, match="not divisible by mesh axis"):
        cp_transformer_apply(_cfg(T), params, z[:3], mesh=mesh2, axis="ctx",
                             dp_axis="data")
    with pytest.raises(ValueError, match="distinct"):
        cp_transformer_apply(_cfg(T), params, z, mesh=mesh2, axis="ctx",
                             dp_axis="ctx")
    with pytest.raises(ValueError, match="mesh has no"):
        from cpc_tpu.config import (EncoderConfig, LossConfig, ModelConfig)
        mcfg = ModelConfig(
            encoder=EncoderConfig(channels=(8,), kernels=(4,), strides=(2,),
                                  d_enc=8),
            ar=ArConfig(kind="transformer", d_ar=8, num_layers=1,
                        num_heads=2, max_len=T),
            loss=LossConfig(prediction_steps=2, negatives="all_steps"))
        cp_cpc_loss_and_metrics(mcfg, params, z, mesh=mesh2, axis="ctx",
                                dp_axis="model")


def test_dp_cp_train_step_loss_decreases():
    """make_cp_train_step on the 2-D (data, ctx) mesh — the FULL training
    step (value_and_grad + Adam from cfg.train) is jittable and trainable:
    ~40 steps on one small batch drive the loss down."""
    from cpc_tpu.config import (CPCConfig, DataConfig, EncoderConfig,
                                LossConfig, ModelConfig, TrainConfig)
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.cp import make_cp_train_step

    mesh2 = _mesh2d((2, 4))
    T = 4 * 4
    cfg = CPCConfig(
        name="dpcp_test",
        model=ModelConfig(
            encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                                  strides=(2, 2), d_enc=16),
            ar=ArConfig(kind="transformer", d_ar=16, num_layers=1,
                        num_heads=2, max_len=T),
            loss=LossConfig(prediction_steps=2, negatives="all_steps")),
        data=DataConfig(batch_size=4, snippet_samples=T * 4),
        train=TrainConfig(learning_rate=3e-3))
    model = CPCModel(cfg.model)
    x = jnp.asarray(np.random.default_rng(19).standard_normal((4, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(6), x)
    step, opt = make_cp_train_step(cfg, mesh=mesh2, axis="ctx",
                                   dp_axis="data")
    opt_state = opt.init(params)
    losses = []
    for _ in range(40):
        params, opt_state, m = step(params, opt_state, x)
        losses.append(float(m["loss"]))
    assert np.isfinite(m["grad_norm"])
    assert losses[-1] < losses[0] - 0.3, losses[::8]

    # knobs the wrapper doesn't implement raise instead of silently no-oping
    import dataclasses
    with pytest.raises(ValueError, match="accum"):
        make_cp_train_step(
            dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, accum_steps=2)), mesh=mesh2, dp_axis="data")


def test_dp_cp_train_step_augment_equals_single_device():
    """data.augment under CP (VERDICT r3 next #5): the global-array
    augmentation (applied inside the jit, OUTSIDE the shard_map) must give
    EXACTLY the single-device augmented loss for the same per-step key —
    gain/polarity/noise are per-sample, and the circular time shift crosses
    ctx-shard boundaries through GSPMD's inserted collectives."""
    from cpc_tpu.config import (CPCConfig, DataConfig, EncoderConfig,
                                LossConfig, ModelConfig, TrainConfig)
    from cpc_tpu.data.loader import device_prepare
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.ops.dsp import augment_waveform
    from cpc_tpu.ops.infonce import infonce_loss_and_metrics
    from cpc_tpu.parallel.cp import make_cp_train_step

    mesh2 = _mesh2d((2, 4))
    T = 4 * 4
    cfg = CPCConfig(
        name="dpcp_aug_test",
        model=ModelConfig(
            encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                                  strides=(2, 2), d_enc=16),
            ar=ArConfig(kind="transformer", d_ar=16, num_layers=1,
                        num_heads=2, max_len=T),
            loss=LossConfig(prediction_steps=2, negatives="all_steps")),
        data=DataConfig(batch_size=4, snippet_samples=T * 4, augment=True),
        train=TrainConfig(learning_rate=3e-3))
    model = CPCModel(cfg.model)
    x = jnp.asarray(np.random.default_rng(23).standard_normal((4, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(11), x)
    step, opt = make_cp_train_step(cfg, mesh=mesh2, axis="ctx",
                                   dp_axis="data")
    rng = jax.random.key(77)

    def run(key):  # fresh arg trees per call: params/opt_state are donated
        p = jax.tree.map(jnp.array, params)
        return step(p, opt.init(p), x, key)[2]

    m = run(rng)

    # single-device oracle: same prepare -> same key discipline -> the
    # plain (xla-attention) forward + jnp all_steps InfoNCE
    k_aug, _ = jax.random.split(rng)
    xa = augment_waveform(device_prepare(x, normalize=cfg.data.normalize),
                          k_aug,
                          gain_db=cfg.data.augment_gain_db,
                          noise_snr_db=cfg.data.augment_noise_snr_db,
                          shift_max=cfg.data.augment_shift_max)
    out = model.apply(params, xa)
    want, want_m = infonce_loss_and_metrics(out.preds, out.z,
                                            negatives="all_steps")
    np.testing.assert_allclose(float(m["loss"]), float(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m["acc"]),
                               np.asarray(want_m["acc"]), atol=1e-6)
    # distinct keys change the loss (the rng is actually live)
    m2 = run(jax.random.key(78))
    assert abs(float(m2["loss"]) - float(m["loss"])) > 1e-6


def test_cp_training_loss_decreases(mesh):
    """The CP path is trainable, not just correct: ~40 Adam steps through
    cp_cpc_loss_from_audio on one small batch drive the loss down."""
    import optax

    from cpc_tpu.config import EncoderConfig, LossConfig, ModelConfig
    from cpc_tpu.models.cpc import CPCModel
    from cpc_tpu.parallel.cp import cp_cpc_loss_from_audio

    T = 8 * 4
    mcfg = ModelConfig(
        encoder=EncoderConfig(channels=(8, 16), kernels=(4, 4),
                              strides=(2, 2), d_enc=16),
        ar=ArConfig(kind="transformer", d_ar=16, num_layers=1, num_heads=2,
                    max_len=T),
        loss=LossConfig(prediction_steps=2, negatives="all_steps"))
    model = CPCModel(mcfg)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((4, T * 4)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, _), grads = jax.value_and_grad(
            lambda p: cp_cpc_loss_from_audio(mcfg, p, x, mesh=mesh),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses[::8]
