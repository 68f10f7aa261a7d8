"""Host-master residency (models/hostmem.py): the offloaded pipeline —
layers on host, stacked arrays as the only device copy — must be
numerically indistinguishable from the device-resident pipeline.

This is the memory architecture that lets the canonical 7B sensitivity
scan run at FULL depth on one 16 GB v5e (VERDICT r3 item #2): duplicate
per-layer + stacked copies cannot coexist at 13 GB of layer weights.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from asvd4llm_tpu.calib.search import binary_search_truncation_rank
from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_ppl
from asvd4llm_tpu.calib.stats import calib_input_distribution
from asvd4llm_tpu.config import ASVDConfig
from asvd4llm_tpu.models import hostmem
from asvd4llm_tpu.models.init import init_params
from asvd4llm_tpu.models.scan_forward import stack_layers
from asvd4llm_tpu.models.spec import llama_spec, opt_spec

import jax


def _tiny(spec_fn=llama_spec, **kw):
    base = dict(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=3, num_heads=4, num_kv_heads=4, head_dim=8,
                max_position_embeddings=64)
    base.update(kw)
    spec = spec_fn(**base)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    loader = [{"input_ids": rng.randint(0, 128, size=(1, 24))}
              for _ in range(3)]
    cfg = ASVDConfig(model_id="t", calib_dataset="synthetic",
                     param_ratio_target=0.8, act_aware=True, alpha=0.5,
                     scaling_method="abs_mean", n_calib_samples=3,
                     seqlen=24, svd_backend="exact", eval_dtype="float32",
                     use_cache=False)
    return params, spec, loader, cfg


def test_offload_roundtrip_and_detection():
    params, spec, _, _ = _tiny()
    assert not hostmem.is_host_layers(params)
    lb = hostmem.layer_bytes(params)
    assert lb > 0
    host = hostmem.offload_layers(params)
    assert hostmem.is_host_layers(host)
    for layer in host["layers"]:
        for leaf in layer.values():
            if isinstance(leaf, dict) and leaf.get("w") is not None:
                assert isinstance(leaf["w"], np.ndarray)
    # non-layer leaves untouched (still jax arrays)
    assert not isinstance(host["embed_tokens"], np.ndarray)
    back = hostmem.device_put_dense_leaves(host)
    for layer in back["layers"]:
        for leaf in layer.values():
            if isinstance(leaf, dict) and leaf.get("w") is not None:
                assert not isinstance(leaf["w"], np.ndarray)


@pytest.mark.parametrize("spec_fn", [llama_spec, opt_spec])
def test_stats_scan_matches_hook_forward(spec_fn):
    params, spec, loader, _ = _tiny(spec_fn)
    ref = calib_input_distribution(params, spec, loader, "abs_mean")
    host = hostmem.offload_layers(
        {**params, "layers": [dict(l) for l in params["layers"]]})
    stacked = stack_layers(host, spec)
    got = calib_input_distribution(host, spec, loader, "abs_mean",
                                   stacked=stacked)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_stats_scan_abs_max_matches():
    params, spec, loader, _ = _tiny()
    ref = calib_input_distribution(params, spec, loader, "abs_max")
    stacked = stack_layers(params, spec)
    got = calib_input_distribution(hostmem.offload_layers(params), spec,
                                   loader, "abs_max", stacked=stacked)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_offloaded_pipeline_matches_device_pipeline():
    """stats -> sensitivity -> search must produce identical sensitivity
    dicts and rank manifests whether layers live on device or on host
    with the stacked arrays as the single device representation."""
    params, spec, loader, cfg = _tiny()

    stats_d = calib_input_distribution(params, spec, loader, "abs_mean")
    sens_d = calib_sensitivity_ppl(params, spec, loader, cfg, stats=stats_d)
    comp_d, man_d = binary_search_truncation_rank(
        params, spec, sens_d, loader, cfg, stats=stats_d)

    # offload_layers DELETES the source device buffers (by design: the
    # pipeline's caller may still hold the old pytree) — give it fresh
    # copies so comp_d's shared leaves survive for the comparison below
    fresh = jax.tree.map(lambda x: jnp.array(x), params)
    host = hostmem.offload_layers(fresh)
    stacked = stack_layers(host, spec)
    stats_h = calib_input_distribution(host, spec, loader, "abs_mean",
                                       stacked=stacked)
    sens_h = calib_sensitivity_ppl(host, spec, loader, cfg, stats=stats_h,
                                   stacked=stacked)
    del stacked
    comp_h, man_h = binary_search_truncation_rank(
        host, spec, sens_h, loader, cfg, stats=stats_h)
    comp_h = hostmem.device_put_dense_leaves(comp_h)

    assert set(sens_d) == set(sens_h)
    for name in sens_d:
        for r, p in sens_d[name].items():
            assert sens_h[name][r] == pytest.approx(p, rel=1e-4), (name, r)
    assert man_d == man_h

    # the compressed models agree leaf for leaf
    for i, (ld, lh) in enumerate(zip(comp_d["layers"], comp_h["layers"])):
        for k in ld:
            if not isinstance(ld[k], dict):
                continue
            for fk in ld[k]:
                a, b = ld[k][fk], lh[k][fk]
                if a is None:
                    assert b is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                    err_msg=f"layers[{i}].{k}.{fk}")


def test_search_final_pass_deterministic_under_eviction():
    """The final decompose pass evicts each name's cached max-rank SVD
    after use (peak-HBM bound). Eviction must not change results: two
    identical searches agree on the manifest."""
    params, spec, loader, cfg = _tiny()
    stats = calib_input_distribution(params, spec, loader, "abs_mean")
    sens = calib_sensitivity_ppl(params, spec, loader, cfg, stats=stats)
    comp, man = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats)
    assert man  # at least one layer compressed
    comp2, man2 = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats)
    assert man == man2


# ------------------------------------------------- streamed fisher -------

def _fisher_pair(n_layers=3, tie=False, batches=2, **kw):
    """(device fisher, host-master streamed fisher) on identical params."""
    from asvd4llm_tpu.calib.fisher import calib_fisher_info
    base = dict(vocab_size=96, hidden_size=32, intermediate_size=64,
                num_layers=n_layers, num_heads=4, num_kv_heads=2, head_dim=8,
                max_position_embeddings=64, tie_word_embeddings=tie)
    base.update(kw)
    spec = llama_spec(**base)
    params = init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.RandomState(7)
    loader = [{"input_ids": rng.randint(0, 96, size=(1, 16))}
              for _ in range(batches)]
    dev = calib_fisher_info(params, spec, loader)
    fresh = init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    host = hostmem.offload_layers(fresh)
    assert hostmem.is_host_layers(host)
    stream = calib_fisher_info(host, spec, loader)
    return dev, stream


def _assert_fisher_equal(dev, stream):
    assert set(dev) == set(stream)
    for k in dev:
        np.testing.assert_allclose(np.asarray(stream[k]), np.asarray(dev[k]),
                                   rtol=5e-4, atol=1e-7, err_msg=k)


def test_fisher_streamed_matches_whole_model():
    """Layer-streamed fisher (host-master residency) is numerically the
    whole-model jax.grad fisher (VERDICT r4 weak #7: fisher previously
    REQUIRED device layers; now it streams one layer at a time)."""
    _assert_fisher_equal(*_fisher_pair(n_layers=3, tie=False))


def test_fisher_streamed_tied_head():
    """Tied lm_head: the head-use gradient and the embedding-lookup
    gradient must be summed BEFORE squaring, like the whole-model path's
    shared differentiated weight."""
    dev, stream = _fisher_pair(n_layers=2, tie=True)
    assert "lm_head" in dev
    _assert_fisher_equal(dev, stream)


def test_fisher_streamed_full_depth_dims():
    """Full canonical DEPTH (32 layers) at tiny widths on CPU — the
    streamed backward's O(1)-in-depth residency is the point; this is the
    VERDICT r4 item-7 'done' criterion."""
    dev, stream = _fisher_pair(n_layers=32, tie=False, batches=1)
    assert sum("layers" in k for k in stream) == 32 * 7
    _assert_fisher_equal(dev, stream)


def test_fisher_streamed_double_shift_parity():
    """The reference's double-shift quirk switch must also stream."""
    from asvd4llm_tpu.calib.fisher import calib_fisher_info
    spec = llama_spec(vocab_size=96, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                      max_position_embeddings=64)
    params = init_params(spec, jax.random.PRNGKey(5), dtype=jnp.float32)
    rng = np.random.RandomState(9)
    loader = [{"input_ids": rng.randint(0, 96, size=(1, 16))}]
    dev = calib_fisher_info(params, spec, loader, double_shift=True)
    fresh = init_params(spec, jax.random.PRNGKey(5), dtype=jnp.float32)
    stream = calib_fisher_info(hostmem.offload_layers(fresh), spec, loader,
                               double_shift=True)
    _assert_fisher_equal(dev, stream)


def test_scan_programs_independent_of_n_calib():
    """VERDICT r4 item 6: the suffix-evaluator program shapes must not
    depend on n_calib once n >= the fixed row block, so a probe-budget
    run warms the canonical run's compile cache. Two scans at different
    n (both >= rb) must add ZERO new compiled programs for the block
    evaluators on the second run."""
    from asvd4llm_tpu.calib import sensitivity as S

    spec = llama_spec(vocab_size=96, hidden_size=32, intermediate_size=48,
                      num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                      max_position_embeddings=64)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.RandomState(0)

    def run(n):
        loader = [{"input_ids": rng.randint(0, 96, size=(1, 48))}
                  for _ in range(n)]
        cfg = ASVDConfig(model_id="t", calib_dataset="synthetic",
                         param_ratio_target=0.8, act_aware=False,
                         alpha=0.5, n_calib_samples=n, seqlen=48,
                         svd_backend="exact", eval_dtype="float32",
                         use_cache=False)
        return calib_sensitivity_ppl(params, spec, loader, cfg)

    # S=48 -> rb = 2048//47 = 43 -> min(43, n): rb differs when n < 43...
    # use n big enough that rb is the same? rb = min(43, n). For the
    # production regime (S=2048) rb=1 always; emulate by asserting the
    # BLOCK evaluator's cache does not grow when n grows past rb.
    n1, n2 = 43, 86   # rb = 43 for both -> identical block shapes
    run(n1)
    c_suffix = S._ppl_multi_ratio_suffix._cache_size()
    c_advance = S._advance_block._cache_size()
    run(n2)
    assert S._ppl_multi_ratio_suffix._cache_size() == c_suffix
    assert S._advance_block._cache_size() == c_advance
