"""Pipeline orchestration tests: compress() + evaluate() + quantization on a
tiny model with synthetic data (offline)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.config import ASVDConfig  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    count_linear_params, is_lowrank, iter_linears,
)
from asvd4llm_tpu.ops.quant_apply import quantize_model_weights  # noqa: E402
from asvd4llm_tpu.pipeline import compress, evaluate, write_results  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=128,
        word_embed_proj_dim=32)
    torch.manual_seed(0)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


def test_compress_and_evaluate_synthetic(tiny, tmp_path):
    params, spec = tiny
    cfg = ASVDConfig(
        model_id="tiny-opt", calib_dataset="synthetic", eval_ppl="synthetic",
        param_ratio_target=0.85, act_aware=True, n_calib_samples=3,
        seqlen=48, svd_backend="exact", cache_dir=str(tmp_path / "cache"),
        output_dir=str(tmp_path / "out"), use_cache=True)

    compressed, manifest, arts = compress(params, spec, None, cfg)
    assert manifest
    assert count_linear_params(compressed, spec) < count_linear_params(params, spec)
    assert any(is_lowrank(l) for _, l in iter_linears(compressed, spec))

    results = evaluate(compressed, spec, None, cfg)
    assert "synthetic" in results and np.isfinite(results["synthetic"])

    write_results(cfg, results, manifest)
    assert (tmp_path / "out" / "result.txt").exists()
    assert (tmp_path / "out" / "results.jsonl").exists()


def test_quantize_model_rtn(tiny):
    params, spec = tiny
    q = quantize_model_weights(params, spec, "rtn_int8")
    for (name, leaf), (_, qleaf) in zip(iter_linears(params, spec),
                                        iter_linears(q, spec)):
        assert not np.allclose(np.asarray(leaf["w"]), np.asarray(qleaf["w"])) \
            or float(np.abs(np.asarray(leaf["w"])).max()) == 0
        # int8 fake-quant should stay close
        err = np.abs(np.asarray(leaf["w"]) - np.asarray(qleaf["w"])).max()
        rng = np.asarray(leaf["w"]).max() - np.asarray(leaf["w"]).min()
        assert err <= rng / 255 + 1e-6


def test_quantize_lowrank_factors(tiny):
    from asvd4llm_tpu.models.registry import lowrank_leaf, set_linear, linear_names
    params, spec = tiny
    name = linear_names(params, spec)[0]
    import jax
    a = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    p = set_linear(params, spec, name, lowrank_leaf(a, b, None))
    q = quantize_model_weights(p, spec, "rtn_int6")
    from asvd4llm_tpu.models.registry import get_linear
    qleaf = get_linear(q, spec, name)
    assert is_lowrank(qleaf)
    assert not np.allclose(np.asarray(qleaf["A"]), np.asarray(a))


def test_int8_deployment_leaves_forward_and_generate(tiny):
    """Low-rank leaves convert to real-int8 deployment format; forward and
    generation match the dequantized model."""
    import jax
    from asvd4llm_tpu.eval.generate import generate
    from asvd4llm_tpu.models.decoder import forward
    from asvd4llm_tpu.models.registry import (
        get_linear, is_q8_lowrank, lowrank_leaf, set_linear,
    )
    from asvd4llm_tpu.ops.asvd import factorize_linear
    from asvd4llm_tpu.ops.quant import QuantParams, dequantize
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int8

    params, spec = tiny
    name = "model.decoder.layers.0.fc1"
    leaf = get_linear(params, spec, name)
    f = factorize_linear(leaf["w"], leaf["b"], 0.7, backend="exact")
    p_lr = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))

    p_q8 = quantize_lowrank_factors_int8(p_lr, spec)
    q8 = get_linear(p_q8, spec, name)
    assert is_q8_lowrank(q8) and q8["A8"].dtype == jnp.int8

    # reference: dequantized factors through the float path
    a = dequantize(q8["A8"], QuantParams(q8["Asc"], q8["Azp"], 255))
    b = dequantize(q8["B8"], QuantParams(q8["Bsc"], q8["Bzp"], 255))
    p_deq = set_linear(params, spec, name,
                       lowrank_leaf(a.astype(jnp.float32),
                                    b.astype(jnp.float32), f.bias))

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 12)))
    np.testing.assert_allclose(np.asarray(forward(p_q8, ids, spec)),
                               np.asarray(forward(p_deq, ids, spec)),
                               atol=1e-3, rtol=1e-3)

    out_q8 = generate(p_q8, spec, np.asarray(ids[:, :6]), max_new_tokens=4)
    out_deq = generate(p_deq, spec, np.asarray(ids[:, :6]), max_new_tokens=4)
    np.testing.assert_array_equal(out_q8, out_deq)


def test_pipeline_deploy_int8_flag(tiny, tmp_path):
    from asvd4llm_tpu.models.registry import is_q8_lowrank, iter_linears
    params, spec = tiny
    cfg = ASVDConfig(
        model_id="tiny-opt-q8", calib_dataset="synthetic",
        param_ratio_target=0.85, act_aware=True, n_calib_samples=2,
        seqlen=48, svd_backend="exact", cache_dir=str(tmp_path / "cache"),
        output_dir=str(tmp_path / "out"), use_cache=False,
        deploy_int8_factors=True)
    compressed, manifest, _ = compress(params, spec, None, cfg)
    q8_leaves = [n for n, l in iter_linears(compressed, spec)
                 if is_q8_lowrank(l)]
    assert set(q8_leaves) == set(manifest)
    results = evaluate(compressed, spec, None, cfg.replace(eval_ppl="synthetic"))
    assert np.isfinite(results["synthetic"])
