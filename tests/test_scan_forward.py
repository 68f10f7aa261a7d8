"""Scan-layers forward parity vs the unrolled forward, for every family
including gemma-2's alternating sliding windows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvd4llm_tpu.models.decoder import forward
from asvd4llm_tpu.models.init import init_params
from asvd4llm_tpu.models.registry import get_linear, lowrank_leaf, set_linear
from asvd4llm_tpu.models.scan_forward import can_scan, forward_scan
from asvd4llm_tpu.models.spec import gemma2_spec, llama_spec, opt_spec


SPECS = {
    "llama": llama_spec(vocab_size=128, hidden_size=32, intermediate_size=64,
                        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=8,
                        max_position_embeddings=64),
    "opt": opt_spec(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=3, num_heads=4, num_kv_heads=4, head_dim=8,
                    max_position_embeddings=64),
    "gemma2": gemma2_spec(vocab_size=128, hidden_size=32,
                          intermediate_size=64, num_layers=4, num_heads=4,
                          num_kv_heads=2, head_dim=8,
                          max_position_embeddings=64, sliding_window=6,
                          attn_logit_softcap=50.0, final_logit_softcap=30.0),
    "mistral": llama_spec(vocab_size=128, hidden_size=32,
                          intermediate_size=64, num_layers=3, num_heads=4,
                          num_kv_heads=2, head_dim=8,
                          max_position_embeddings=64, sliding_window=6,
                          sliding_pattern=1),
}


@pytest.mark.parametrize("family", list(SPECS))
def test_scan_matches_unrolled(family):
    spec = SPECS[family]
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 20), 0, 128)
    assert can_scan(params, spec)
    ref = np.asarray(forward(params, ids, spec))
    out = np.asarray(forward_scan(params, ids, spec))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("family", ["llama", "gemma2"])
def test_suffix_scan_matches_full(family):
    """Prefix-cached suffix evaluation: embeddings + l dense layers
    (apply_stacked_layer) + forward_hidden_scan_from(start=l) must equal
    the full substituted scan for every split point l."""
    from asvd4llm_tpu.models.decoder import apply_lm_head
    from asvd4llm_tpu.models.scan_forward import (
        apply_stacked_layer, embed_scan_inputs, forward_hidden_scan,
        forward_hidden_scan_from, stack_layers,
    )

    spec = SPECS[family]
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    stacked = stack_layers(params, spec)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 20), 0, 128)
    L = len(params["layers"])
    key = "gate_proj"
    w = params["layers"][0][key]["w"]
    w_hat = w + 0.1 * jax.random.normal(jax.random.PRNGKey(2), w.shape)

    for target in range(L):
        sub = (key, jnp.int32(target), w_hat)
        ref = forward_hidden_scan(params, ids, spec, stacked=stacked,
                                  substitute=sub)
        x, _, _ = embed_scan_inputs(params, ids, spec)
        for i in range(target):
            x = apply_stacked_layer(params, x, spec, stacked=stacked,
                                    idx=jnp.int32(i))
        out = forward_hidden_scan_from(params, x, spec, stacked=stacked,
                                       start=jnp.int32(target),
                                       substitute=sub)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # and through the head (what the suffix PPL evaluator consumes)
        np.testing.assert_allclose(
            np.asarray(apply_lm_head(params, spec, out)),
            np.asarray(apply_lm_head(params, spec, ref)),
            atol=2e-4, rtol=1e-4)


def test_opt_projections_scan_parity():
    """OPT-350m geometry (project_in/out) through the scan forward — the
    projections ride outside the layer scan (ref models the same modules
    in modeling_opt; cited in decoder.forward_hidden:331-377)."""
    import torch
    import transformers

    from asvd4llm_tpu.models.loader import params_from_torch_model

    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=False, word_embed_proj_dim=24)
    torch.manual_seed(5)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    assert can_scan(params, spec)
    ids = np.random.RandomState(7).randint(0, 128, size=(2, 14))
    ref = np.asarray(forward(params, jnp.asarray(ids), spec))
    out = np.asarray(forward_scan(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_can_scan_false_for_lowrank():
    spec = SPECS["llama"]
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    leaf = get_linear(params, spec, "model.layers.0.mlp.gate_proj")
    o, i = leaf["w"].shape
    p2 = set_linear(params, spec, "model.layers.0.mlp.gate_proj",
                    lowrank_leaf(jnp.zeros((o, 4)), jnp.zeros((4, i)), None))
    assert not can_scan(p2, spec)
