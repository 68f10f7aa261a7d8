"""Sharding tests on the 8-device virtual CPU mesh: TP/DP forward parity,
low-rank TP layout, DP-sharded calibration, Fisher step over the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from asvd4llm_tpu.models.decoder import forward
from asvd4llm_tpu.models.init import init_params
from asvd4llm_tpu.models.registry import get_linear, lowrank_leaf, set_linear
from asvd4llm_tpu.models.spec import llama_spec, opt_spec
from asvd4llm_tpu.parallel.mesh import (
    data_sharding, make_mesh, param_shardings, shard_params,
)


SPEC = llama_spec(vocab_size=256, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=8, num_kv_heads=4, head_dim=8,
                  max_position_embeddings=128)


@pytest.fixture(scope="module")
def setup(eight_devices):
    params = init_params(SPEC, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 256)
    ref = np.asarray(forward(params, ids, SPEC))
    return params, ids, ref


def test_tp_forward_matches_single_device(setup):
    params, ids, ref = setup
    mesh = make_mesh((1, 8))
    sharded = shard_params(params, SPEC, mesh)
    out = np.asarray(jax.jit(
        lambda p, i: forward(p, i, SPEC))(sharded, ids))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    # check a column-parallel weight is actually sharded over tp
    w = get_linear(sharded, SPEC, "model.layers.0.self_attn.q_proj")["w"]
    assert len(w.sharding.device_set) == 8


def test_dp_tp_forward(setup):
    params, ids, ref = setup
    mesh = make_mesh((2, 4))
    sharded = shard_params(params, SPEC, mesh)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    out = np.asarray(jax.jit(
        lambda p, i: forward(p, i, SPEC))(sharded, ids_sh))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_tp_lowrank_leaf_forward(setup):
    params, ids, ref = setup
    name = "model.layers.0.mlp.down_proj"
    leaf = get_linear(params, SPEC, name)
    o, i = leaf["w"].shape
    r = 16
    a = jax.random.normal(jax.random.PRNGKey(2), (o, r)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(3), (r, i)) * 0.05
    p_lr = set_linear(params, SPEC, name, lowrank_leaf(a, b, None))
    ref_lr = np.asarray(forward(p_lr, ids, SPEC))

    mesh = make_mesh((1, 8))
    sharded = shard_params(p_lr, SPEC, mesh)
    lr = get_linear(sharded, SPEC, name)
    # row-parallel low-rank: B sharded on in-dim, A replicated
    assert lr["B"].sharding.spec == P(None, "tp")
    out = np.asarray(jax.jit(lambda p, x: forward(p, x, SPEC))(sharded, ids))
    np.testing.assert_allclose(out, ref_lr, atol=2e-5, rtol=1e-5)


def test_indivisible_dims_fall_back_to_replication(eight_devices):
    spec = llama_spec(vocab_size=100, hidden_size=24, intermediate_size=36,
                      num_layers=1, num_heads=3, num_kv_heads=3, head_dim=8,
                      max_position_embeddings=64)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh((1, 8))
    shardings = param_shardings(params, spec, mesh)
    # 36 % 8 != 0 -> gate_proj replicated
    assert shardings["layers"][0]["gate_proj"]["w"].spec == P()
    sharded = shard_params(params, spec, mesh)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 100)
    ref = np.asarray(forward(params, ids, spec))
    out = np.asarray(jax.jit(lambda p, i: forward(p, i, spec))(sharded, ids))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_dp_sharded_fisher_step(setup):
    """Fisher calibration (the framework's full fwd+bwd 'training step')
    jitted over a dp x tp mesh."""
    from asvd4llm_tpu.calib.fisher import _fisher_step, _split_linear_weights
    params, ids, _ = setup
    mesh = make_mesh((2, 4))
    sharded = shard_params(params, SPEC, mesh)
    weights = _split_linear_weights(sharded, SPEC)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    fisher = _fisher_step(sharded, weights, ids_sh, SPEC)
    # compare against single-device
    w0 = _split_linear_weights(params, SPEC)
    ref = _fisher_step(params, w0, ids, SPEC)
    for k in ref:
        np.testing.assert_allclose(np.asarray(fisher[k]), np.asarray(ref[k]),
                                   atol=1e-6, rtol=1e-3)


def test_opt_init_forward(eight_devices):
    spec = opt_spec(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                    max_position_embeddings=64)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    logits = forward(params, ids, spec)
    assert logits.shape == (2, 12, 128)
    assert bool(jnp.isfinite(logits).all())


def test_pipeline_compress_on_mesh(eight_devices, tmp_path):
    """compress() with cfg.mesh_shape=(2,4): params placed on the mesh, all
    phases run SPMD, results match the single-device pipeline."""
    from asvd4llm_tpu.config import ASVDConfig
    from asvd4llm_tpu.pipeline import compress
    from asvd4llm_tpu.models.registry import count_linear_params

    params = init_params(SPEC, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg = ASVDConfig(model_id="mesh-demo", calib_dataset="synthetic",
                     param_ratio_target=0.85, act_aware=True,
                     n_calib_samples=2, seqlen=32, svd_backend="exact",
                     cache_dir=str(tmp_path / "c1"), use_cache=False)
    c1, m1, _ = compress(params, SPEC, None, cfg)

    cfg2 = cfg.replace(mesh_shape=(2, 4), cache_dir=str(tmp_path / "c2"))
    c2, m2, _ = compress(params, SPEC, None, cfg2)
    assert m1.keys() == m2.keys()
    assert all(m1[k] == m2[k] for k in m1)
    assert count_linear_params(c1, SPEC) == count_linear_params(c2, SPEC)

    # 3-entry mesh_shape routes to the multi-slice (dcn, dp, tp) mesh
    cfg3 = cfg.replace(mesh_shape=(2, 2, 2), cache_dir=str(tmp_path / "c3"))
    c3, m3, _ = compress(params, SPEC, None, cfg3)
    assert m1.keys() == m3.keys()
    assert all(m1[k] == m3[k] for k in m1)


def test_sensitivity_scan_candidates_sharded_over_dp(eight_devices, tmp_path):
    """Candidate-sharded sensitivity scan on a (2, 4) mesh matches the
    single-device scan exactly (weight grid has 6 points; dp=2 divides it)."""
    from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_ppl
    from asvd4llm_tpu.config import ASVDConfig

    params = init_params(SPEC, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    loader = [{"input_ids": rng.randint(0, 256, size=(1, 24))}
              for _ in range(2)]
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9,
                     svd_backend="exact", n_calib_samples=2)
    s_single = calib_sensitivity_ppl(params, SPEC, loader, cfg)
    mesh = make_mesh((2, 4))
    sharded = shard_params(params, SPEC, mesh)
    s_mesh = calib_sensitivity_ppl(sharded, SPEC, loader, cfg, mesh=mesh)
    for name in s_single:
        for r in s_single[name]:
            assert s_mesh[name][r] == pytest.approx(s_single[name][r],
                                                    rel=1e-4), (name, r)


def test_multislice_mesh_forward_and_stats(setup):
    """(dcn=2, dp=2, tp=2) multi-slice mesh: params shard on tp only
    (replicated across dcn), batches shard over (dcn, dp) jointly, and
    the forward + calibration stats match single-device."""
    from asvd4llm_tpu.calib.stats import _stats_forward
    from asvd4llm_tpu.parallel.mesh import make_multislice_mesh

    params, ids, ref = setup
    mesh = make_multislice_mesh(dcn=2, dp=2, tp=2)
    assert mesh.shape == {"dcn": 2, "dp": 2, "tp": 2}
    sharded = shard_params(params, SPEC, mesh)
    # a column-parallel weight shards over tp only -> 2 distinct shards
    w = get_linear(sharded, SPEC, "model.layers.0.self_attn.q_proj")["w"]
    assert w.sharding.spec == P("tp", None)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    assert ids_sh.sharding.spec == P(("dcn", "dp"), None)
    out = np.asarray(jax.jit(lambda p, i: forward(p, i, SPEC))(sharded,
                                                               ids_sh))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    stats = _stats_forward(sharded, ids_sh, SPEC, "abs_mean")
    ref_stats = _stats_forward(params, ids, SPEC, "abs_mean")
    for k in ref_stats:
        np.testing.assert_allclose(np.asarray(stats[k]),
                                   np.asarray(ref_stats[k]),
                                   atol=1e-5, rtol=1e-4)
