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


def test_can_scan_false_for_lowrank():
    spec = SPECS["llama"]
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    leaf = get_linear(params, spec, "model.layers.0.mlp.gate_proj")
    o, i = leaf["w"].shape
    p2 = set_linear(params, spec, "model.layers.0.mlp.gate_proj",
                    lowrank_leaf(jnp.zeros((o, 4)), jnp.zeros((4, i)), None))
    assert not can_scan(p2, spec)
