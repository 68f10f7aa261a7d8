"""Generation / KV-cache tests: decode parity with the full forward, the
realized low-rank latent KV cache vs dense-cache decode, greedy generate
vs torch transformers generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.eval.generate import (  # noqa: E402
    decode_step, generate, init_caches, layer_uses_latent_kv, prefill_host,
)
from asvd4llm_tpu.models import forward, params_from_torch_model  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    get_linear, lowrank_leaf, set_linear,
)
from asvd4llm_tpu.ops.asvd import factorize_linear  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return model, params, spec


def _compress_kv(params, spec, ratio=1.2):
    """Factorize k_proj/v_proj of every layer (KV-compression mode)."""
    out = params
    for i in range(len(params["layers"])):
        for key in ("k_proj", "v_proj"):
            name = f"model.layers.{i}.self_attn.{key}"
            leaf = get_linear(params, spec, name)
            f = factorize_linear(leaf["w"], leaf["b"], ratio, backend="exact")
            assert f is not None
            out = set_linear(out, spec, name, lowrank_leaf(f.A, f.B, f.bias))
    return out


def test_decode_matches_full_forward(tiny):
    _, params, spec = tiny
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 128, size=(2, 10)))
    full = np.asarray(forward(params, ids, spec))

    caches = init_caches(params, spec, 2, 16, dtype=jnp.float32)
    logits, caches = prefill_host(params, spec, ids[:, :-1], caches)
    np.testing.assert_allclose(np.asarray(logits), full[:, -2], atol=1e-4,
                               rtol=1e-3)
    step_logits, _ = decode_step(params, spec, ids[:, -1:], caches, 9)
    np.testing.assert_allclose(np.asarray(step_logits), full[:, -1],
                               atol=1e-4, rtol=1e-3)


def test_latent_kv_cache_matches_dense_cache(tiny):
    """The realized latent cache must be numerically equivalent to the
    dense cache when k/v are low-rank (same factors, different cache)."""
    _, params, spec = tiny
    p = _compress_kv(params, spec, ratio=1.2)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 128, size=(2, 8)))

    c_dense = init_caches(p, spec, 2, 12, dtype=jnp.float32, latent=False)
    c_lat = init_caches(p, spec, 2, 12, dtype=jnp.float32, latent=True)
    assert all("tk" in c for c in c_lat)
    # latent cache is genuinely smaller in the compressed-kv regime?
    # (at ratio 1.2 the rank ~ 0.6*kv_dim, so tk+tv < k+v)
    lat_sz = sum(c["tk"].size + c["tv"].size for c in c_lat)
    dense_sz = sum(c["k"].size + c["v"].size for c in c_dense)
    assert lat_sz < dense_sz

    l0, c_dense = prefill_host(p, spec, ids, c_dense, latent=False)
    l1, c_lat = prefill_host(p, spec, ids, c_lat, latent=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-4,
                               rtol=1e-3)

    tok = jnp.argmax(l0, -1)[:, None].astype(ids.dtype)
    s0, c_dense = decode_step(p, spec, tok, c_dense, 8)
    s1, c_lat = decode_step(p, spec, tok, c_lat, 8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-4,
                               rtol=1e-3)
    # one more step to exercise cache reuse
    t0 = jnp.argmax(s0, -1)[:, None].astype(ids.dtype)
    s0b, _ = decode_step(p, spec, t0, c_dense, 9)
    s1b, _ = decode_step(p, spec, t0, c_lat, 9)
    np.testing.assert_allclose(np.asarray(s1b), np.asarray(s0b), atol=1e-4,
                               rtol=1e-3)


def test_greedy_generate_matches_torch(tiny):
    model, params, spec = tiny
    rng = np.random.RandomState(2)
    prompt = rng.randint(0, 128, size=(1, 6))
    with torch.no_grad():
        ref = model.generate(torch.from_numpy(prompt.copy()),
                             max_new_tokens=8, do_sample=False,
                             pad_token_id=0).numpy()
    ours = generate(params, spec, prompt, max_new_tokens=8)
    np.testing.assert_array_equal(ours[:, :ref.shape[1]], ref)


def test_generate_with_latent_kv(tiny):
    _, params, spec = tiny
    p = _compress_kv(params, spec, ratio=1.0)
    rng = np.random.RandomState(3)
    prompt = rng.randint(0, 128, size=(2, 5))
    dense_out = generate(p, spec, prompt, max_new_tokens=6, latent_kv=False)
    lat_out = generate(p, spec, prompt, max_new_tokens=6, latent_kv=True)
    np.testing.assert_array_equal(lat_out, dense_out)


def test_eos_early_stop(tiny):
    _, params, spec = tiny
    prompt = np.asarray([[1, 2, 3]])
    out = generate(params, spec, prompt, max_new_tokens=20, eos_token_id=None)
    assert out.shape[1] == 23


def test_mistral_sliding_generate_matches_torch():
    """Decode-path sliding-window masking vs torch generate (prompt longer
    than the window so the mask actually truncates)."""
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, sliding_window=6,
        attn_implementation="eager")
    torch.manual_seed(7)
    model = transformers.MistralForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    prompt = np.random.RandomState(8).randint(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = model.generate(torch.from_numpy(prompt.copy()),
                             max_new_tokens=6, do_sample=False,
                             pad_token_id=0).numpy()
    ours = generate(params, spec, prompt, max_new_tokens=6)
    np.testing.assert_array_equal(ours[:, :ref.shape[1]], ref)


def test_gemma2_generate_matches_torch():
    """Gemma-2 decode: alternating sliding windows + softcaps + GQA +
    post-norms through the cache path."""
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, sliding_window=6,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16, attn_implementation="eager")
    torch.manual_seed(9)
    model = transformers.Gemma2ForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    prompt = np.random.RandomState(10).randint(0, 128, size=(1, 12))
    with torch.no_grad():
        ref = model.generate(torch.from_numpy(prompt.copy()),
                             max_new_tokens=5, do_sample=False,
                             pad_token_id=0).numpy()
    ours = generate(params, spec, prompt, max_new_tokens=5)
    np.testing.assert_array_equal(ours[:, :ref.shape[1]], ref)


def test_opt_generate_matches_torch():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        word_embed_proj_dim=32)
    torch.manual_seed(11)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    prompt = np.random.RandomState(12).randint(2, 128, size=(1, 8))
    with torch.no_grad():
        ref = model.generate(torch.from_numpy(prompt.copy()),
                             max_new_tokens=5, do_sample=False,
                             pad_token_id=1).numpy()
    ours = generate(params, spec, prompt, max_new_tokens=5)
    np.testing.assert_array_equal(ours[:, :ref.shape[1]], ref)


def test_generate_forwards_use_pallas(tiny, monkeypatch):
    """generate(use_pallas=...) must reach decode_step (round-1 advisor
    finding: the flag was accepted but dropped, silently disabling the
    fused serving kernels through the public API)."""
    import asvd4llm_tpu.eval.generate as gen
    seen = []
    real = gen.decode_step

    def spy(params, spec, token, caches, pos, use_pallas=False):
        seen.append(use_pallas)
        return real(params, spec, token, caches, pos)  # CPU: run XLA path

    _, params, spec = tiny
    monkeypatch.setattr(gen, "decode_step", spy)
    prompt = np.asarray([[1, 2, 3]])
    gen.generate(params, spec, prompt, max_new_tokens=3, use_pallas=True)
    assert seen and all(seen)


def test_generate_on_device_matches_host_loop(tiny):
    """The lax.while_loop decode (one dispatch, EOS early exit) must be
    token-identical to the per-token host loop, incl. with EOS stopping
    and with the latent KV cache."""
    from asvd4llm_tpu.eval.generate import generate_on_device

    _, params, spec = tiny
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 128, size=(2, 6))
    host = generate(params, spec, prompt, max_new_tokens=8)
    dev = generate_on_device(params, spec, prompt, max_new_tokens=8)
    np.testing.assert_array_equal(dev, host)

    # EOS: pick the first token the host loop emits as the eos id so the
    # loop must exit early, then compare step-for-step
    eos = int(host[0, 6])
    host_e = generate(params, spec, prompt, max_new_tokens=8,
                      eos_token_id=eos)
    dev_e = generate_on_device(params, spec, prompt, max_new_tokens=8,
                               eos_token_id=eos)
    np.testing.assert_array_equal(dev_e, host_e)
    assert dev_e.shape[1] <= host.shape[1]

    # latent KV path
    p = _compress_kv(params, spec, ratio=1.0)
    host_l = generate(p, spec, prompt, max_new_tokens=6, latent_kv=True)
    dev_l = generate_on_device(p, spec, prompt, max_new_tokens=6,
                               latent_kv=True)
    np.testing.assert_array_equal(dev_l, host_l)


def test_latent_v_only_cache_matches_dense(tiny):
    """latent="v" (dense K + absorbed latent V): exact algebra, so decode
    must match the dense cache; cache memory sits between latent-kv and
    dense. V has no RoPE, so unlike latent-K this mode adds NO
    up-projection compute at MHA geometry."""
    _, params, spec = tiny
    p = _compress_kv(params, spec, ratio=1.2)
    rng = np.random.RandomState(9)
    ids = jnp.asarray(rng.randint(0, 128, size=(2, 8)))

    c_dense = init_caches(p, spec, 2, 12, dtype=jnp.float32, latent=False)
    c_v = init_caches(p, spec, 2, 12, dtype=jnp.float32, latent="v")
    assert all("tv" in c and "k" in c and "v" not in c for c in c_v)
    sz = lambda cs: sum(v.size for c in cs for v in c.values())
    c_kv = init_caches(p, spec, 2, 12, dtype=jnp.float32, latent=True)
    assert sz(c_kv) < sz(c_v) < sz(c_dense)

    l0, c_dense = prefill_host(p, spec, ids, c_dense, latent=False)
    l1, c_v = prefill_host(p, spec, ids, c_v, latent="v")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-4,
                               rtol=1e-3)
    tok = jnp.argmax(l0, -1)[:, None].astype(ids.dtype)
    for step in range(2):
        s0, c_dense = decode_step(p, spec, tok, c_dense, 8 + step)
        s1, c_v = decode_step(p, spec, tok, c_v, 8 + step)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   atol=1e-4, rtol=1e-3)
        tok = jnp.argmax(s0, -1)[:, None].astype(ids.dtype)


def test_generate_latent_v_and_on_device(tiny):
    _, params, spec = tiny
    p = _compress_kv(params, spec, ratio=1.0)
    prompt = np.random.RandomState(10).randint(0, 128, size=(2, 5))
    dense_out = generate(p, spec, prompt, max_new_tokens=6)
    v_out = generate(p, spec, prompt, max_new_tokens=6, latent_kv="v")
    np.testing.assert_array_equal(v_out, dense_out)
    from asvd4llm_tpu.eval.generate import generate_on_device
    v_dev = generate_on_device(p, spec, prompt, max_new_tokens=6,
                               latent_kv="v")
    np.testing.assert_array_equal(v_dev, dense_out)
