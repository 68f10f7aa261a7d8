"""Paged KV cache + continuous-batching engine tests.

The paged layout (serving/paged.py) must be numerically equivalent to the
flat caches in eval/generate.py for all three layouts (dense, latent-kv,
latent-v), including RAGGED batches where each row decodes at a different
position — the case flat lockstep caches cannot express."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.eval.generate import generate  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    get_linear, lowrank_leaf, set_linear,
)
from asvd4llm_tpu.ops.asvd import factorize_linear  # noqa: E402
from asvd4llm_tpu.serving import PagedEngine  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


def _compress_kv(params, spec, ratio=1.2):
    out = params
    for i in range(len(params["layers"])):
        for key in ("k_proj", "v_proj"):
            name = f"model.layers.{i}.self_attn.{key}"
            leaf = get_linear(params, spec, name)
            f = factorize_linear(leaf["w"], leaf["b"], ratio, backend="exact")
            out = set_linear(out, spec, name, lowrank_leaf(f.A, f.B, f.bias))
    return out


@pytest.mark.parametrize("latent", [False, True, "v"])
def test_paged_single_sequence_matches_flat_generate(tiny, latent):
    params, spec = tiny
    if latent:
        params = _compress_kv(params, spec)
    rng = np.random.RandomState(0)
    prompt = rng.randint(0, 128, size=(1, 11))

    flat = generate(params, spec, jnp.asarray(prompt), max_new_tokens=9,
                    latent_kv=latent)
    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4, latent=latent)
    rid = eng.add_request(prompt[0], max_new_tokens=9)
    eng.run()
    np.testing.assert_array_equal(eng.result(rid),
                                  np.asarray(flat)[0, prompt.shape[1]:])


@pytest.mark.parametrize("latent", [False, True])
def test_continuous_batching_ragged_matches_lockstep(tiny, latent):
    """Three prompts of different lengths decode concurrently with ragged
    positions; each must produce exactly its single-sequence greedy
    output."""
    params, spec = tiny
    if latent:
        params = _compress_kv(params, spec)
    rng = np.random.RandomState(1)
    prompts = [rng.randint(0, 128, size=(n,)) for n in (5, 13, 9)]

    eng = PagedEngine(params, spec, max_batch=3, page_size=8, num_pages=64,
                      max_pages_per_seq=6, latent=latent)
    rids = [eng.add_request(p, max_new_tokens=8) for p in prompts]
    eng.run()

    for p, rid in zip(prompts, rids):
        solo = generate(params, spec, jnp.asarray(p[None, :]),
                        max_new_tokens=8, latent_kv=latent)
        np.testing.assert_array_equal(
            eng.result(rid), np.asarray(solo)[0, len(p):],
            err_msg=f"request {rid} diverged from single-sequence decode")


def test_page_reuse_after_retirement(tiny):
    """A finished request's pages return to the pool and are reused by a
    later request without corrupting its output (the admission is delayed
    by slot pressure, exercising the waiting queue too)."""
    params, spec = tiny
    rng = np.random.RandomState(2)
    p1 = rng.randint(0, 128, size=(9,))
    p2 = rng.randint(0, 128, size=(10,))

    eng = PagedEngine(params, spec, max_batch=1, page_size=8,
                      num_pages=5,  # only 4 usable pages: forces reuse
                      max_pages_per_seq=4)
    free0 = len(eng.free_pages)
    r1 = eng.add_request(p1, max_new_tokens=6)
    assert len(eng.free_pages) < free0
    r2 = eng.add_request(p2, max_new_tokens=6)  # waits: no free slot
    assert eng.slots[0] is not None and len(eng.waiting) == 1
    eng.run()
    assert len(eng.free_pages) == free0  # every page returned

    for p, rid in ((p1, r1), (p2, r2)):
        solo = generate(params, spec, jnp.asarray(p[None, :]),
                        max_new_tokens=6)
        np.testing.assert_array_equal(eng.result(rid),
                                      np.asarray(solo)[0, len(p):])


def test_multi_step_scheduling_matches_stepwise(tiny):
    """run(chunk=4) (one dispatch per 4 tokens, admission between chunks)
    must produce exactly the step()-by-step outputs, including a request
    that hits max_new_tokens mid-chunk."""
    params, spec = tiny
    rng = np.random.RandomState(4)
    prompts = [rng.randint(0, 128, size=(n,)) for n in (6, 11)]
    budgets = [10, 6]  # 6 is not a multiple of the chunk: mid-chunk finish

    results = []
    for chunk in (1, 4):
        eng = PagedEngine(params, spec, max_batch=2, page_size=8,
                          num_pages=64, max_pages_per_seq=6)
        rids = [eng.add_request(p, max_new_tokens=b)
                for p, b in zip(prompts, budgets)]
        eng.run(chunk=chunk)
        results.append([eng.result(r).tolist() for r in rids])
    assert results[0] == results[1]


def test_paged_pallas_kernel_matches_flat_kernel():
    """Interpret-mode paged flash-decoding (page table as scalar-prefetch
    grid index) vs the flat latent kernel, sequence by sequence: shuffled
    physical pages + ragged positions must not change the math."""
    import jax

    from asvd4llm_tpu.ops.pallas_latent_attention import (
        latent_decode_attention, paged_latent_decode_attention,
    )
    from asvd4llm_tpu.models.decoder import rope_cos_sin

    B, KV, rep, hd = 3, 2, 2, 16
    H = KV * rep
    P, MP, NP = 16, 4, 16
    Rk, Rv = 24, 20
    T = MP * P
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.float32)
    a_k = jax.random.normal(ks[1], (KV * hd, Rk), jnp.float32) * 0.2
    a_v = jax.random.normal(ks[2], (KV * hd, Rv), jnp.float32) * 0.2
    cos, sin = rope_cos_sin(jnp.arange(T), hd, 10000.0)
    positions = jnp.asarray([P - 2, 2 * P + 3, T - 1], jnp.int32)  # ragged

    # scatter each sequence's latents into a shuffled page pool
    rng = np.random.RandomState(7)
    perm = rng.permutation(NP - 1) + 1      # page 0 reserved
    page_table = np.zeros((B, MP), np.int32)
    tk_pool = np.zeros((NP, P, Rk), np.float32)
    tv_pool = np.zeros((NP, P, Rv), np.float32)
    flat_tk = np.asarray(jax.random.normal(ks[3], (B, T, Rk))) * 0.5
    flat_tv = np.asarray(jax.random.normal(ks[4], (B, T, Rv))) * 0.5
    pi = 0
    for b in range(B):
        for p in range(MP):
            page_table[b, p] = perm[pi]
            tk_pool[perm[pi]] = flat_tk[b, p * P:(p + 1) * P]
            tv_pool[perm[pi]] = flat_tv[b, p * P:(p + 1) * P]
            pi += 1

    paged = paged_latent_decode_attention(
        q, jnp.asarray(tk_pool), jnp.asarray(tv_pool), a_k, a_v, cos, sin,
        jnp.asarray(page_table), positions, kv_heads=KV, scale=hd ** -0.5,
        interpret=True)

    for b in range(B):
        flat = latent_decode_attention(
            q[b:b + 1], jnp.asarray(flat_tk[b:b + 1]),
            jnp.asarray(flat_tv[b:b + 1]), a_k, a_v, cos, sin,
            int(positions[b]), kv_heads=KV, scale=hd ** -0.5, tt=P,
            interpret=True)
        np.testing.assert_allclose(np.asarray(paged[b]),
                                   np.asarray(flat[0]), atol=1e-4,
                                   rtol=1e-4, err_msg=f"sequence {b}")


@pytest.mark.parametrize("v_latent", [False, True])
def test_paged_dense_kernel_matches_xla_paged(tiny, v_latent):
    """Interpret-mode dense-K paged flash-decoding (dense V and V-latent
    variants) vs the XLA gather path through a full paged_decode_step."""
    import jax

    from asvd4llm_tpu.serving.paged import (
        init_paged_pools, paged_decode_step, pages_needed,
        prefill_into_pages,
    )
    import asvd4llm_tpu.ops.pallas_latent_attention as pla

    params, spec = tiny
    if v_latent:
        # factor only v_proj -> latent-V-only pools
        for i in range(2):
            name = f"model.layers.{i}.self_attn.v_proj"
            leaf = get_linear(params, spec, name)
            f = factorize_linear(leaf["w"], leaf["b"], 1.2, backend="exact")
            params = set_linear(params, spec, name,
                                lowrank_leaf(f.A, f.B, f.bias))
    rng = np.random.RandomState(5)
    prompt = rng.randint(0, 128, size=(1, 10))
    P = 8
    pools = init_paged_pools(params, spec, 16, P, jnp.float32,
                             latent="v" if v_latent else False)
    n = pages_needed(prompt.shape[1] + 1, P)
    pages = list(range(1, n + 1))
    logits, pools = prefill_into_pages(params, spec, jnp.asarray(prompt),
                                       pools, pages)
    pt = np.zeros((1, 4), np.int32)
    pt[0, :n] = pages
    tok = jnp.asarray([[int(np.asarray(logits)[0].argmax())]])
    pos = jnp.asarray([prompt.shape[1]], jnp.int32)

    ref_logits, _ = paged_decode_step(params, spec, tok, pools,
                                      jnp.asarray(pt), pos)

    # force the fused path through interpret mode
    orig = pla._paged_dense_core
    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    pla._paged_dense_core = interp
    try:
        fused_logits, _ = paged_decode_step(params, spec, tok, pools,
                                            jnp.asarray(pt), pos,
                                            use_pallas=True)
    finally:
        pla._paged_dense_core = orig
    np.testing.assert_allclose(np.asarray(fused_logits),
                               np.asarray(ref_logits), atol=2e-4, rtol=1e-3)


def test_paged_kernel_tp_shard_map():
    """Tensor-parallel paged flash-decoding (shard_map over kv heads, one
    kernel instance per tp shard, latent pools replicated) matches the
    single-device kernel."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from asvd4llm_tpu.models.decoder import rope_cos_sin
    from asvd4llm_tpu.ops.pallas_latent_attention import (
        paged_latent_decode_attention, paged_latent_decode_attention_tp,
    )
    from asvd4llm_tpu.parallel.mesh import make_mesh

    B, KV, rep, hd = 2, 4, 2, 16
    H = KV * rep
    P, MP, NP = 16, 3, 12
    Rk, Rv = 24, 20
    T = MP * P
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, H, hd), jnp.float32)
    a_k = jax.random.normal(ks[1], (KV * hd, Rk), jnp.float32) * 0.2
    a_v = jax.random.normal(ks[2], (KV * hd, Rv), jnp.float32) * 0.2
    vb = jax.random.normal(ks[5], (KV * hd,), jnp.float32) * 0.1
    cos, sin = rope_cos_sin(jnp.arange(T), hd, 10000.0)
    positions = jnp.asarray([P + 2, T - 1], jnp.int32)
    pt = jnp.asarray(np.arange(1, 1 + B * MP).reshape(B, MP), jnp.int32)
    tk_pool = jax.random.normal(ks[3], (NP, P, Rk), jnp.float32) * 0.5
    tv_pool = jax.random.normal(ks[4], (NP, P, Rv), jnp.float32) * 0.5

    ref = paged_latent_decode_attention(
        q, tk_pool, tv_pool, a_k, a_v, cos, sin, pt, positions,
        kv_heads=KV, scale=hd ** -0.5, v_bias=vb, interpret=True)
    got = paged_latent_decode_attention_tp(
        q, tk_pool, tv_pool, a_k, a_v, cos, sin, pt, positions,
        make_mesh((2, 4)), kv_heads=KV, scale=hd ** -0.5, v_bias=vb,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_paged_decode_on_tp_mesh(tiny):
    """paged_decode_step under (dp=2, tp=2) NamedShardings (dense K/V pools
    sharded over kv heads on tp, latents replicated) must reproduce the
    unsharded logits — multi-chip paged serving via GSPMD."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from asvd4llm_tpu.parallel.mesh import (
        make_mesh, shard_paged_pools, shard_params,
    )
    from asvd4llm_tpu.serving.paged import (
        init_paged_pools, paged_decode_step, pages_needed,
        prefill_into_pages,
    )

    params, spec = tiny
    params = _compress_kv(params, spec)
    rng = np.random.RandomState(6)
    P = 8
    B, MP = 4, 3
    pools = init_paged_pools(params, spec, 32, P, jnp.float32, latent=True)
    pt = np.zeros((B, MP), np.int32)
    positions = np.zeros((B,), np.int32)
    toks = np.zeros((B, 1), np.int32)
    next_page = 1
    for b, S in enumerate((5, 9, 13, 7)):
        n = pages_needed(S + 1, P)
        pages = list(range(next_page, next_page + n))
        next_page += n
        prompt = rng.randint(0, 128, size=(1, S))
        logits, pools = prefill_into_pages(params, spec,
                                           jnp.asarray(prompt), pools, pages)
        pt[b, :n] = pages
        positions[b] = S
        toks[b, 0] = int(np.asarray(logits)[0].argmax())

    ref, _ = paged_decode_step(params, spec, jnp.asarray(toks), pools,
                               jnp.asarray(pt), jnp.asarray(positions))

    mesh = make_mesh((2, 2))
    sharded_params = shard_params(params, spec, mesh)
    sharded_pools = shard_paged_pools(pools, mesh)
    got, _ = paged_decode_step(sharded_params, spec, jnp.asarray(toks),
                               sharded_pools, jnp.asarray(pt),
                               jnp.asarray(positions))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)


@pytest.mark.parametrize("latent", [False, True, "v"])
def test_chunked_prefill_matches_whole_prefill(tiny, latent):
    """Chunked admission (fixed-size paged appends, one compiled program
    for every prompt length) must reproduce whole-prompt prefill exactly:
    same generated tokens for prompts whose lengths are and are not chunk
    multiples."""
    params, spec = tiny
    if latent:
        params = _compress_kv(params, spec)
    rng = np.random.RandomState(9)
    prompts = [rng.randint(0, 128, size=(n,)) for n in (8, 11, 5)]

    results = []
    for chunk in (0, 4):
        eng = PagedEngine(params, spec, max_batch=3, page_size=8,
                          num_pages=64, max_pages_per_seq=6, latent=latent,
                          prefill_chunk=chunk)
        rids = [eng.add_request(p, max_new_tokens=7) for p in prompts]
        eng.run()
        results.append([eng.result(r).tolist() for r in rids])
    assert results[0] == results[1]


def test_sampling_engine(tiny):
    """temperature/top-p sampling: deterministic under a fixed seed,
    varies across seeds, and temperature->0 equals greedy."""
    params, spec = tiny
    rng = np.random.RandomState(8)
    prompt = rng.randint(0, 128, size=(9,))

    def run(temperature, seed, chunk):
        eng = PagedEngine(params, spec, max_batch=1, page_size=8,
                          num_pages=32, max_pages_per_seq=4,
                          temperature=temperature, top_p=0.9, seed=seed)
        rid = eng.add_request(prompt, max_new_tokens=12)
        eng.run(chunk=chunk)  # sampling runs ON DEVICE inside the scan
        return eng.result(rid).tolist()

    assert run(1.5, 0, 4) == run(1.5, 0, 4)    # seeded determinism
    outs = {tuple(run(1.5, s, 4)) for s in range(4)}
    assert len(outs) > 1                        # actually stochastic
    greedy = generate(params, spec, jnp.asarray(prompt[None, :]),
                      max_new_tokens=12)
    assert run(0.0, 0, 4) == np.asarray(greedy)[0, 9:].tolist()
    # position-keyed PRNG: multi-step scan == stepwise host scheduling
    assert run(1.5, 3, 4) == run(1.5, 3, 1)
    assert run(0.7, 5, 3) == run(0.7, 5, 1)


def test_sampled_multistep_matches_stepwise_batch(tiny):
    """Two concurrent sampled requests: chunked scan scheduling and
    stepwise scheduling must emit identical tokens (keys depend only on
    (seed, rid, position), never on chunk size or admission order)."""
    params, spec = tiny
    rng = np.random.RandomState(12)
    prompts = [rng.randint(0, 128, size=(n,)) for n in (7, 10)]

    def run(chunk):
        eng = PagedEngine(params, spec, max_batch=2, page_size=8,
                          num_pages=32, max_pages_per_seq=4,
                          temperature=1.2, top_p=0.85, seed=9,
                          prefill_chunk=4)
        rids = [eng.add_request(p, max_new_tokens=9) for p in prompts]
        eng.run(chunk=chunk)
        return [eng.result(r).tolist() for r in rids]

    assert run(5) == run(1)


def test_paged_engine_opt_family(tmp_path):
    """OPT (learned positions, out_proj naming, pre-norm) through the
    paged engine: chunked admission + ragged decode == flat generate."""
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, tie_word_embeddings=False)
    torch.manual_seed(4)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    rng = np.random.RandomState(10)
    prompts = [rng.randint(2, 128, size=(n,)) for n in (6, 9)]

    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4, prefill_chunk=4)
    rids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
    eng.run(chunk=3)
    for p, rid in zip(prompts, rids):
        solo = generate(params, spec, jnp.asarray(p[None, :]),
                        max_new_tokens=6)
        np.testing.assert_array_equal(eng.result(rid),
                                      np.asarray(solo)[0, len(p):])


def test_paged_engine_gemma2_style(tmp_path):
    """Gemma-2 features through the paged engine: logit softcap, sliding
    window on alternating layers, post-attention/post-MLP norms, tied
    embeddings. Paged ragged decode must equal flat generate."""
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, sliding_window=8,
        attn_logit_softcapping=30.0, final_logit_softcapping=20.0)
    torch.manual_seed(6)
    model = transformers.Gemma2ForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    assert spec.layer_uses_sliding(0) != spec.layer_uses_sliding(1)
    rng = np.random.RandomState(11)
    prompts = [rng.randint(1, 128, size=(n,)) for n in (12, 7)]

    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4)
    rids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
    eng.run()
    for p, rid in zip(prompts, rids):
        solo = generate(params, spec, jnp.asarray(p[None, :]),
                        max_new_tokens=6)
        np.testing.assert_array_equal(
            eng.result(rid), np.asarray(solo)[0, len(p):],
            err_msg="gemma2 paged decode diverged (softcap/sliding)")


def test_eos_early_retirement(tiny):
    """EOS mid-stream retires the request (token list ends at EOS) while
    the other slot keeps decoding."""
    params, spec = tiny
    rng = np.random.RandomState(3)
    p1 = rng.randint(0, 128, size=(7,))
    # find the first greedy token of p1 and use it as the EOS id, so the
    # request finishes after exactly one token
    first = int(np.asarray(generate(params, spec, jnp.asarray(p1[None, :]),
                                    max_new_tokens=1))[0, -1])
    p2 = rng.randint(0, 128, size=(6,))

    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4, eos_token_id=first)
    r1 = eng.add_request(p1, max_new_tokens=10)
    r2 = eng.add_request(p2, max_new_tokens=5)
    eng.run()
    assert eng.result(r1).tolist() == [first]
    assert len(eng.result(r2)) <= 5 and len(eng.result(r2)) >= 1


def test_append_batch_select_matches_full_head(tiny):
    """paged_append_batch_select's gathered-head logits equal the full
    head's logits at the same (row, position) pairs (the admission tick's
    fast path vs the reference semantics)."""
    import jax
    from asvd4llm_tpu.serving.paged import (
        init_paged_pools, paged_append_batch, paged_append_batch_select,
    )

    params, spec = tiny
    P, MB, C = 8, 3, 4
    pools = init_paged_pools(params, spec, 16, P, jnp.float32)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 128, size=(MB, C)), jnp.int32)
    pt = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0], [5, 6, 0, 0]], jnp.int32)
    pos0 = jnp.asarray([0, 4, 2], jnp.int32)
    rows = jnp.asarray([0, 2, 0], jnp.int32)
    cols = jnp.asarray([3, 1, 0], jnp.int32)

    full, pools_a = paged_append_batch(params, spec, ids, pools, pt, pos0)
    sel, pools_b = paged_append_batch_select(params, spec, ids, pools, pt,
                                             pos0, rows, cols)
    want = np.asarray(full)[np.asarray(rows), np.asarray(cols)]
    np.testing.assert_allclose(np.asarray(sel), want, atol=1e-5, rtol=1e-5)
    for pa, pb in zip(pools_a, pools_b):
        for k in pa:
            np.testing.assert_array_equal(np.asarray(pa[k]),
                                          np.asarray(pb[k]))


def test_group_chunk_helpers_match_per_group_loop():
    """_qk_group_logits / _pv_group_numerator (the kernels' chunked
    cross-dot bodies) equal the naive per-group contraction for GQA and
    MHA geometries."""
    import jax
    from asvd4llm_tpu.ops.pallas_latent_attention import (
        _pv_group_numerator, _qk_group_logits,
    )

    rng = np.random.RandomState(1)
    for KV, rep in ((2, 4), (8, 1), (4, 2)):
        H, hd, TT = KV * rep, 16, 24
        q = jnp.asarray(rng.randn(H, hd), jnp.float32)
        k_flat = jnp.asarray(rng.randn(TT, KV * hd), jnp.float32)
        got = _qk_group_logits(q, k_flat, KV, rep, hd, TT)
        want = np.concatenate([
            np.asarray(q)[g * rep:(g + 1) * rep]
            @ np.asarray(k_flat)[:, g * hd:(g + 1) * hd].T
            for g in range(KV)], axis=0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   rtol=1e-5)

        p = jnp.asarray(rng.rand(H, TT), jnp.float32)
        v_flat = jnp.asarray(rng.randn(TT, KV * hd), jnp.float32)
        got_s = _pv_group_numerator(p, v_flat, KV, rep, hd, TT)
        want_s = np.concatenate([
            np.asarray(p)[g * rep:(g + 1) * rep]
            @ np.asarray(v_flat)[:, g * hd:(g + 1) * hd]
            for g in range(KV)], axis=0)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-4,
                                   rtol=1e-5)


def test_engine_request_stats(tiny):
    """TTFT/TPOT markers: per-request stats populated with sane ordering
    (enqueue <= first token <= finish), aggregate percentiles present."""
    params, spec = tiny
    rng = np.random.RandomState(5)
    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4)
    rids = [eng.add_request(rng.randint(0, 128, size=(s,)),
                            max_new_tokens=4) for s in (6, 9)]
    eng.run(chunk=2)
    for rid in rids:
        st = eng.request_stats(rid)
        assert st["done"] and st["n_tokens"] == 4
        assert st["ttft_s"] is not None and st["ttft_s"] >= 0
        assert st["tpot_s"] is not None and st["tpot_s"] >= 0
    agg = eng.stats()
    assert agg["requests_done"] == 2
    assert agg["tokens_generated"] == 8
    assert agg["ttft_s"]["p50"] is not None
    assert agg["tpot_s"]["max"] is not None


def test_engine_stream_matches_run(tiny):
    """stream() yields exactly the tokens run() would produce, in
    per-request emission order, for both chunk=1 and multi-step."""
    params, spec = tiny
    rng = np.random.RandomState(7)
    prompts = [rng.randint(0, 128, size=(s,)) for s in (5, 8)]

    ref = {}
    eng = PagedEngine(params, spec, max_batch=2, page_size=8, num_pages=32,
                      max_pages_per_seq=4)
    rids = [eng.add_request(p, max_new_tokens=5) for p in prompts]
    eng.run(chunk=2)
    for rid in rids:
        ref[rid] = eng.result(rid).tolist()

    for chunk in (1, 2):
        eng2 = PagedEngine(params, spec, max_batch=2, page_size=8,
                           num_pages=32, max_pages_per_seq=4)
        rids2 = [eng2.add_request(p, max_new_tokens=5) for p in prompts]
        got = {rid: [] for rid in rids2}
        for rid, tok in eng2.stream(chunk=chunk):
            got[rid].append(tok)
        for r_ref, r_got in zip(rids, rids2):
            assert got[r_got] == ref[r_ref], (chunk, r_got)


def test_prefix_cache_identical_outputs_and_fewer_prefill_tokens(tiny):
    """Automatic prefix caching: a request sharing a long prefix with an
    earlier one produces IDENTICAL tokens while skipping the shared whole
    pages at prefill; page accounting never leaks or double-frees."""
    params, spec = tiny
    rng = np.random.RandomState(11)
    P = 8
    sys_prompt = rng.randint(0, 128, size=(3 * P,))          # 3 full pages
    p1 = np.concatenate([sys_prompt, rng.randint(0, 128, size=(5,))])
    p2 = np.concatenate([sys_prompt, rng.randint(0, 128, size=(7,))])
    p3 = np.asarray(p1)                                      # exact repeat

    def run(prefix_cache):
        eng = PagedEngine(params, spec, max_batch=1, page_size=P,
                          num_pages=64, max_pages_per_seq=8,
                          prefill_chunk=P, prefix_cache=prefix_cache)
        outs, filled0 = [], []
        for p in (p1, p2, p3):
            rid = eng.add_request(p, max_new_tokens=4)
            filled0.append(eng.requests[rid].filled)
            eng.run(chunk=2)
            outs.append(eng.result(rid).tolist())
        return eng, outs, filled0

    eng_off, outs_off, f_off = run(0)
    eng_on, outs_on, f_on = run(8)
    assert outs_on == outs_off
    assert f_off == [0, 0, 0]
    # p1 cold; p2 hits the 3-page prefix; p3 (identical) hits 3 pages too
    # ((S-1)//P == 3 full pages of its own 29-token prompt)
    assert f_on == [0, 3 * P, 3 * P]

    # all requests retired: every non-scratch page is either free or held
    # by the index, and refcounts are consistent
    held = sorted(p for pages, _ in eng_on._prefix_index.values()
                  for p in pages)
    assert set(held).isdisjoint(eng_on.free_pages)
    eng_on.clear_prefix_cache()
    assert not eng_on._prefix_index
    assert sorted(eng_on.free_pages) == list(range(1, 64))
    assert not eng_on.page_refs


def test_default_page_size_byte_targeted():
    """Pages are sized by bytes, not tokens: the K-page DMA must stay
    ~2 MB at every kv-head count so the paged kernel's per-iteration
    fixed costs amortize identically for MHA and GQA (VERDICT r4 #4)."""
    from asvd4llm_tpu.serving.paged import default_page_size

    assert default_page_size(32, 128, 2) == 256   # MHA32 bf16: measured-good
    assert default_page_size(8, 128, 2) == 1024   # gqa8 bf16: 4x fewer iters
    assert default_page_size(8, 64, 2) == 2048    # hits the hi clamp
    assert default_page_size(32, 128, 4) == 128   # f32 halves tokens/page
    # every result is a power of two within the clamps
    for kv in (1, 2, 4, 8, 16, 32, 64):
        p = default_page_size(kv, 128, 2)
        assert 64 <= p <= 2048 and (p & (p - 1)) == 0
        # K-page bytes never exceed the target
        assert p * kv * 128 * 2 <= 2 << 20 or p == 64


def test_engine_auto_page_size(tiny):
    """page_size=None resolves from the spec geometry."""
    from asvd4llm_tpu.serving.paged import default_page_size

    params, spec = tiny
    eng = PagedEngine(params, spec, max_batch=1, num_pages=8,
                      max_pages_per_seq=2, latent=False,
                      dtype=jnp.float32)
    assert eng.page_size == default_page_size(
        spec.num_kv_heads, spec.head_dim, 4)
