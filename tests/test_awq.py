"""AWQ quantization tests: group-wise quant correctness, scale search must
beat plain RTN on a salient-channel distribution, SVD-factor handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvd4llm_tpu.ops.awq import (
    awq_quantize_model, awq_search_and_quant, groupwise_fake_quant,
)


def test_groupwise_quant_error_bounded():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(8, 256).astype(np.float32))
    wq = groupwise_fake_quant(w, 4, group_size=128)
    # per-group max error <= step/2: check global bound via range/15
    groups = np.asarray(w).reshape(8, 2, 128)
    steps = (groups.max(-1) - groups.min(-1)) / 15
    err = np.abs(np.asarray(wq) - np.asarray(w)).reshape(8, 2, 128).max(-1)
    assert np.all(err <= steps / 2 + 1e-5)


def test_groupwise_quant_unaligned_and_zero():
    w = jnp.zeros((4, 100))
    wq = groupwise_fake_quant(w, 4, group_size=128)
    assert wq.shape == (4, 100)
    np.testing.assert_allclose(np.asarray(wq), 0.0)


def test_awq_beats_rtn_on_salient_channels():
    """With a few high-activation channels, the scale search must reduce
    activation-weighted error vs plain group RTN (alpha=0)."""
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(32, 256).astype(np.float32))
    act = np.ones(256, np.float32)
    act[:8] = 50.0  # salient channels
    act = jnp.asarray(act)

    wq_awq = awq_search_and_quant(w, act, bits=4, group_size=128)
    wq_rtn = groupwise_fake_quant(w, 4, group_size=128)

    def weighted_err(wq):
        return float(jnp.sum((wq - w) ** 2 * (act ** 2)[None, :]))

    assert weighted_err(wq_awq) < weighted_err(wq_rtn)
    # and the salient columns specifically are more accurate
    err_awq = np.abs(np.asarray(wq_awq - w))[:, :8].mean()
    err_rtn = np.abs(np.asarray(wq_rtn - w))[:, :8].mean()
    assert err_awq < err_rtn


def test_awq_int8_near_lossless():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(16, 128).astype(np.float32))
    act = jnp.asarray(np.abs(rng.randn(128)).astype(np.float32) + 0.1)
    wq = awq_search_and_quant(w, act, bits=8, group_size=128)
    assert float(jnp.abs(wq - w).max()) < 0.05


def test_awq_model_pass_quantizes_factors():
    torch = pytest.importorskip("torch")
    import transformers
    from asvd4llm_tpu.models import params_from_torch_model
    from asvd4llm_tpu.models.registry import (
        get_linear, is_lowrank, lowrank_leaf, set_linear,
    )
    from asvd4llm_tpu.ops.asvd import factorize_linear

    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    name = "model.layers.0.mlp.gate_proj"
    leaf = get_linear(params, spec, name)
    f = factorize_linear(leaf["w"], leaf["b"], 0.8, backend="exact")
    params = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))

    stats = {name: jnp.ones((32,))}
    q = awq_quantize_model(params, spec, 8, stats=stats, group_size=32)
    qleaf = get_linear(q, spec, name)
    assert is_lowrank(qleaf)
    assert not np.allclose(np.asarray(qleaf["A"]), np.asarray(f.A))
    assert not np.allclose(np.asarray(qleaf["B"]), np.asarray(f.B))
    # int8 factors stay close
    assert float(jnp.abs(qleaf["A"] - f.A).max()) < 0.1
