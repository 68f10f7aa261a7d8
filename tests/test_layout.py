"""serving/layout.py: the auto KV-layout selector's decision table."""

import jax
import jax.numpy as jnp

from asvd4llm_tpu.models.init import init_params
from asvd4llm_tpu.models.registry import lowrank_leaf
from asvd4llm_tpu.models.spec import llama_spec, opt_spec
from asvd4llm_tpu.serving.layout import choose_layout, pallas_eligible


def _spec(fn=llama_spec, **kw):
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                max_position_embeddings=64)
    base.update(kw)
    return fn(**base)


def _factor(leaf, rank):
    w = leaf["w"]
    a = jnp.zeros((w.shape[0], rank), w.dtype)
    b = jnp.zeros((rank, w.shape[1]), w.dtype)
    return lowrank_leaf(a, b, leaf["b"])


def _params(spec, v_rank=None, k_rank=None):
    p = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    for layer in p["layers"]:
        if v_rank:
            layer["v_proj"] = _factor(layer["v_proj"], v_rank)
        if k_rank:
            layer["k_proj"] = _factor(layer["k_proj"], k_rank)
    return p


def test_dense_model_stays_dense():
    spec = _spec()
    dec = choose_layout(_params(spec), spec, backend="cpu")
    assert dec.latent is False
    assert dec.cache_ratio == 1.0


def test_lowrank_v_selects_latent_v():
    spec = _spec()  # kv_dim = 16
    dec = choose_layout(_params(spec, v_rank=8), spec, backend="cpu")
    assert dec.latent == "v"
    # (16 + 8) / 32 per compressed layer
    assert abs(dec.cache_ratio - 0.75) < 1e-6


def test_full_rank_v_realizes_no_saving():
    spec = _spec()
    dec = choose_layout(_params(spec, v_rank=16), spec, backend="cpu")
    assert dec.latent is False


def test_prefer_memory_selects_fused_kv():
    spec = _spec()
    p = _params(spec, v_rank=8, k_rank=8)
    dec = choose_layout(p, spec, backend="cpu", prefer_memory=True)
    assert dec.latent == "kv"
    assert abs(dec.cache_ratio - 0.5) < 1e-6
    # without the preference, throughput-safe latent-V wins
    dec2 = choose_layout(p, spec, backend="cpu")
    assert dec2.latent == "v"


def test_pallas_eligibility_contract():
    spec = _spec()
    assert pallas_eligible(_params(spec), spec)
    # OPT: learned positions + biased projections -> XLA gather path
    ospec = _spec(opt_spec)
    assert not pallas_eligible(_params(ospec), ospec)
    # TPU backend + eligible -> kernels on; CPU -> off
    dec_cpu = choose_layout(_params(spec, v_rank=8), spec, backend="cpu")
    assert not dec_cpu.use_pallas
    dec_tpu = choose_layout(_params(spec, v_rank=8), spec, backend="tpu")
    assert dec_tpu.use_pallas


def test_gqa_thin_saving_stays_dense():
    """GQA (rep > 1) with a thin V rank saving (Rv > 0.5*kv_dim) measured
    BELOW dense at long T (attn_micro/model_decode r4b+r4c: 0.93x at
    Rv = 0.64*kv_dim) — the throughput default must pick dense there,
    while MHA at the same relative rank keeps latent-V (1.04-1.28x)."""
    gqa = _spec()                       # 4 heads / 2 kv heads, kv_dim 16
    dec = choose_layout(_params(gqa, v_rank=12), gqa, backend="cpu")
    assert dec.latent is False
    assert "thin" in dec.reason
    mha = _spec(num_kv_heads=4)         # rep == 1, kv_dim 32
    dec2 = choose_layout(_params(mha, v_rank=24), mha, backend="cpu")
    assert dec2.latent == "v"
    # prefer_memory still realizes the maximal saving at GQA
    dec3 = choose_layout(_params(gqa, v_rank=12, k_rank=12), gqa,
                         backend="cpu", prefer_memory=True)
    assert dec3.latent == "kv"


def test_context_length_aware_crossovers():
    """VERDICT r4 item 5: the selector encodes the measured per-T
    crossovers (model_decode_bench_r4d), not the worst case. The two
    geometries cross in OPPOSITE directions: MHA latent-V needs long T to
    amortize its T-independent up-projection (0.955x at T1024, 1.256x at
    T4096); thin-saving GQA wins only at short T (1.014x at T1024, 0.871x
    at T4096 — the paged kernel's ragged-read cost grows with pages)."""
    mha = _spec(num_kv_heads=4)         # rep == 1, kv_dim 32
    p_mha = _params(mha, v_rank=24)
    assert choose_layout(p_mha, mha, backend="cpu",
                         expected_T=1024).latent is False
    assert choose_layout(p_mha, mha, backend="cpu",
                         expected_T=4096).latent == "v"

    gqa = _spec()                       # rep == 2, kv_dim 16
    p_thin = _params(gqa, v_rank=12)    # thin: Rv > 0.5*kv_dim
    assert choose_layout(p_thin, gqa, backend="cpu",
                         expected_T=1024).latent == "v"
    assert choose_layout(p_thin, gqa, backend="cpu",
                         expected_T=4096).latent is False

    # strong-saving GQA keeps latent-V at every T
    p_strong = _params(gqa, v_rank=6)
    for T in (512, 1024, 4096, 16384):
        assert choose_layout(p_strong, gqa, backend="cpu",
                             expected_T=T).latent == "v"
