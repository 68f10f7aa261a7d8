"""Logit-parity tests: our functional decoder vs torch transformers.

Tiny randomly-initialized HF models are the oracle (constructed offline —
no downloads). Comparisons in float32; parity tolerance is tight because
both sides are the same math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.models import (  # noqa: E402
    forward, forward_with_stats, params_from_torch_model,
    iter_linears, set_linear, get_linear, linear_names,
)
from asvd4llm_tpu.models.registry import (  # noqa: E402
    dense_leaf, lowrank_leaf, count_linear_params, leaf_shape,
)


def tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def tiny_opt():
    cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=64,
        activation_function="relu",
    )
    torch.manual_seed(1)
    return transformers.OPTForCausalLM(cfg).eval()


def tiny_gemma2():
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        sliding_window=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=16,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    return transformers.Gemma2ForCausalLM(cfg).eval()


def _parity(model, seqlen=24, atol=2e-4):
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, seqlen))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)
    return params, spec


def test_llama_parity():
    _parity(tiny_llama())


def test_opt_parity():
    _parity(tiny_opt())


def test_gemma2_parity():
    # covers sliding window (seqlen > window), softcaps, post-norms, GQA
    _parity(tiny_gemma2(), seqlen=32, atol=5e-4)


def test_registry_roundtrip():
    model = tiny_llama()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    names = linear_names(params, spec)
    assert "model.layers.0.self_attn.q_proj" in names
    assert "model.layers.1.mlp.down_proj" in names
    assert len(names) == 2 * 7

    # functional substitution does not alias
    leaf = get_linear(params, spec, "model.layers.0.self_attn.q_proj")
    out, inn = leaf_shape(leaf)
    new = lowrank_leaf(jnp.zeros((out, 4)), jnp.zeros((4, inn)), leaf["b"])
    p2 = set_linear(params, spec, "model.layers.0.self_attn.q_proj", new)
    assert get_linear(p2, spec, "model.layers.0.self_attn.q_proj")["A"].shape == (out, 4)
    assert "w" in get_linear(params, spec, "model.layers.0.self_attn.q_proj")
    assert count_linear_params(p2, spec) < count_linear_params(params, spec)


def test_lowrank_substitution_forward_matches_recomposed_dense():
    """A low-rank leaf and a dense leaf with w = A@B must produce identical
    forwards (up to fp assoc) — validates the sensitivity scan's
    recomposition trick."""
    model = tiny_llama()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    name = "model.layers.0.mlp.gate_proj"
    leaf = get_linear(params, spec, name)
    out, inn = leaf_shape(leaf)
    rank = 16
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (out, rank)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(1), (rank, inn)) * 0.05

    ids = jnp.asarray(np.random.RandomState(3).randint(0, 256, size=(1, 16)))
    p_lr = set_linear(params, spec, name, lowrank_leaf(a, b, None))
    p_dense = set_linear(params, spec, name, dense_leaf(a @ b, None))
    np.testing.assert_allclose(np.asarray(forward(p_lr, ids, spec)),
                               np.asarray(forward(p_dense, ids, spec)),
                               atol=2e-4, rtol=1e-3)


def test_stats_collection_matches_torch_hooks():
    """abs_mean / abs_max stats must match the reference's hook math
    (ref act_aware_utils.py:62-81) measured with real torch hooks."""
    model = tiny_llama()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    batches = [rng.randint(0, 256, size=(1, 12)) for _ in range(3)]

    # torch side: replicate reference hooks
    import torch.nn as nn
    stats_t = {}
    hooks = []

    def make_hook(name):
        def hook(module, inputs, output):
            x = inputs[0].abs()
            am = x.mean(dim=-2).view(-1)
            stats_t[name] = stats_t.get(name, 0) + am.detach()
        return hook

    for name, mod in model.named_modules():
        # every nn.Linear incl. lm_head, like the reference's hook walk
        if isinstance(mod, nn.Linear):
            hooks.append(mod.register_forward_hook(make_hook(name)))
    with torch.no_grad():
        for b in batches:
            model(torch.from_numpy(b))
    for h in hooks:
        h.remove()

    # ours: one stats-collecting forward per batch, accumulated
    stats_j: dict = {}
    for b in batches:
        _, s = forward_with_stats(params, jnp.asarray(b), spec, collect="abs_mean")
        for k, v in s.items():
            stats_j[k] = stats_j.get(k, 0) + v

    assert set(stats_j) == set(stats_t)
    for k in stats_t:
        np.testing.assert_allclose(np.asarray(stats_j[k]), stats_t[k].numpy(),
                                   atol=1e-4, rtol=1e-3)


def test_abs_max_stats():
    model = tiny_llama()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 256, size=(2, 8)))
    _, s = forward_with_stats(params, ids, spec, collect="abs_max")
    assert all(v.shape == (leaf_shape(get_linear(params, spec, k))[1],)
               for k, v in s.items())
    assert all(bool((v >= 0).all()) for v in s.items().__iter__().__next__()[1:])


def test_mistral_sliding_window_parity():
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, sliding_window=8,
        attn_implementation="eager")
    torch.manual_seed(3)
    model = transformers.MistralForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    assert spec.sliding_window == 8 and spec.layer_uses_sliding(0) \
        and spec.layer_uses_sliding(1)
    ids = np.random.RandomState(5).randint(0, 128, size=(1, 40))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_qwen2_bias_parity():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(4)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    # qwen2 has q/k/v biases; loader must pick them up from the state dict
    assert params["layers"][0]["q_proj"]["b"] is not None
    assert params["layers"][0]["o_proj"]["b"] is None
    ids = np.random.RandomState(6).randint(0, 128, size=(2, 20))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_opt_350m_style_projections_parity():
    """OPT with word_embed_proj_dim != hidden (project_in/out, post-norm,
    no final norm) — the opt-350m geometry."""
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=False, word_embed_proj_dim=24)
    torch.manual_seed(5)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    assert spec.word_embed_proj_dim == 24
    assert params["project_in"]["w"].shape == (48, 24)
    assert params["project_out"]["w"].shape == (24, 48)
    ids = np.random.RandomState(7).randint(0, 128, size=(2, 14))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)

    # and through the decode/generate path
    from asvd4llm_tpu.eval.generate import generate
    prompt = ids[:1, :6]
    with torch.no_grad():
        gref = model.generate(torch.from_numpy(prompt.copy()),
                              max_new_tokens=4, do_sample=False,
                              pad_token_id=1).numpy()
    gours = generate(params, spec, prompt, max_new_tokens=4)
    np.testing.assert_array_equal(gours[:, :gref.shape[1]], gref)


def test_blocked_attention_matches_unblocked():
    """The flash-style blocked prefill attention (lax.scan over key blocks
    with online softmax) must match the one-shot softmax path exactly —
    forced on by shrinking the block thresholds."""
    import transformers

    import asvd4llm_tpu.models.decoder as dec
    from asvd4llm_tpu.models import forward, params_from_torch_model

    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(9)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 96, size=(2, 37)))

    import jax

    # pin dense matmuls to true f32 for the comparison: at default matmul
    # precision this platform's f32 dots run reduced-precision, and their
    # rounding amplifies the paths' harmless 1e-6 attention reassociation
    # into sparse 1e-3-level logit flips
    orig = dec._BLOCK_MIN_SQ, dec._BLOCK_SIZE
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(forward(params, ids, spec))
        dec._BLOCK_MIN_SQ, dec._BLOCK_SIZE = 1, 16   # 37 keys -> 3 blocks
        try:
            got = np.asarray(forward(params, ids, spec))
        finally:
            dec._BLOCK_MIN_SQ, dec._BLOCK_SIZE = orig
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

        # and with a padding mask (fully masked prefix rows stay finite)
        pad_mask = np.ones((2, 37), np.int32)
        pad_mask[0, :5] = 0
        ref = np.asarray(forward(params, ids, spec,
                                 pad_mask=jnp.asarray(pad_mask)))
        dec._BLOCK_MIN_SQ, dec._BLOCK_SIZE = 1, 16
        try:
            got = np.asarray(forward(params, ids, spec,
                                     pad_mask=jnp.asarray(pad_mask)))
        finally:
            dec._BLOCK_MIN_SQ, dec._BLOCK_SIZE = orig
        # fully-masked pad-prefix positions emit well-defined garbage that
        # differs between the paths (uniform over Sk vs over the padded
        # key count) and is never consumed; compare valid positions only
        np.testing.assert_allclose(got[1], ref[1], atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(got[0, 5:], ref[0, 5:], atol=1e-5,
                                   rtol=1e-5)
