"""End-to-end differential parity against the REFERENCE implementation.

Runs /root/reference's own torch pipeline (calib_input_distribution /
calib_fisher_info / calib_sensitivity_ppl / binary_search_truncation_rank /
evaluate_perplexity) on tiny random models and asserts our pipeline
produces the same stats, the same sensitivity dict, an IDENTICAL rank
manifest, and a matching final calibration PPL. Both sides use an exact
truncated SVD (see asvd4llm_tpu/tools/differential.py docstring).
"""

import pytest

torch = pytest.importorskip("torch")

from asvd4llm_tpu.config import ASVDConfig  # noqa: E402
from asvd4llm_tpu.tools import differential as diff  # noqa: E402

pytestmark = pytest.mark.skipif(not diff.reference_available(),
                                reason="reference tree not present")


def _cfg(**kw):
    base = dict(model_id="tiny-differential", calib_dataset="synthetic",
                act_aware=True, scaling_method="abs_mean", alpha=0.5,
                sigma_fuse="UV", rank_align=1, n_calib_samples=4, seed=233,
                svd_backend="exact", fisher_double_shift=True,
                use_cache=False, eval_dtype="float32")
    base.update(kw)
    return ASVDConfig(**base)


def _assert_parity(out):
    assert not out["problems"], "\n".join(out["problems"])
    assert out["ref"]["manifest"], "oracle compressed nothing — vacuous test"


def test_llama_weight_mode_parity(tmp_path):
    """The canonical pipeline: abs_mean act-aware, param-ratio target."""
    out = diff.run_differential(_cfg(param_ratio_target=0.85),
                                str(tmp_path), family="llama")
    _assert_parity(out)
    # the scan must have covered lm_head like the reference's walk
    assert "lm_head" in out["ref"]["sensitivity"]
    assert "lm_head" in out["ours"]["sensitivity"]


def test_opt_weight_mode_parity_sigma_fuse_v(tmp_path):
    """OPT family (biases, learned positions, plain MLP) with sigma_fuse=V
    and rank_align=2, abs_max scaling."""
    out = diff.run_differential(
        _cfg(param_ratio_target=0.8, sigma_fuse="V", rank_align=2,
             scaling_method="abs_max"),
        str(tmp_path), family="opt")
    _assert_parity(out)


def test_llama_kv_cache_mode_parity(tmp_path):
    """KV-cache compression: k/v-only filtering, default ratio 2, ratio/2
    accounting, grid to 1.9 (ref binary_search.py:29-36,94-96)."""
    out = diff.run_differential(
        _cfg(compress_kv_cache=True, kv_cache_ratio_target=0.5,
             param_ratio_target=-1.0),
        str(tmp_path), family="llama")
    _assert_parity(out)
    assert all("k_proj" in k or "v_proj" in k
               for k in out["ref"]["manifest"])


def test_llama_gqa_weight_mode_parity(tmp_path):
    """GQA geometry (kv_heads < heads, kv_dim < hidden): the k/v
    projections are rectangular [kv_dim, hidden] — rank accounting and
    the scan cover a regime every other scenario misses (the reference
    supports GQA Llama via transformers' num_key_value_heads)."""
    out = diff.run_differential(_cfg(param_ratio_target=0.85),
                                str(tmp_path), family="llama",
                                heads=4, kv_heads=2, hidden=32)
    _assert_parity(out)
    assert any("k_proj" in k or "v_proj" in k
               for k in out["ref"]["sensitivity"])


def test_llama_gqa_kv_cache_mode_parity(tmp_path):
    """KV-cache mode on GQA: the KV grid (to 1.9) against [kv_dim, hidden]
    projections where ratio-1.0 rank = numel/(in+out) < kv_dim — exactly
    where the r3 rank-truncation bug lived (ref binary_search.py:29-36,
    94-96; sensitivity.py:36-39)."""
    out = diff.run_differential(
        _cfg(compress_kv_cache=True, kv_cache_ratio_target=0.6,
             param_ratio_target=-1.0),
        str(tmp_path), family="llama", heads=4, kv_heads=2, hidden=32)
    _assert_parity(out)
    assert all("k_proj" in k or "v_proj" in k
               for k in out["ref"]["manifest"])


def test_llama_fisher_ppl_target_parity(tmp_path):
    """Fisher scaling (with the reference's double-shift loss reproduced
    via fisher_double_shift) + ppl-target search mode, act_aware search."""
    cfg = _cfg(scaling_method="fisher", param_ratio_target=-1.0,
               ppl_target=1.0, n_calib_samples=3)
    # pick a reachable target: dense calib ppl * 1.15
    import numpy as np
    import transformers

    import jax.numpy as jnp
    from asvd4llm_tpu.eval.ppl import evaluate_perplexity
    from asvd4llm_tpu.models import params_from_torch_model

    torch.manual_seed(cfg.seed)
    probe = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=96, tie_word_embeddings=False)).eval()
    params, spec = params_from_torch_model(probe, dtype=jnp.float32)
    batches = diff.synthetic_calib_batches(cfg.n_calib_samples, 24, 128,
                                           seed=cfg.seed)
    ids = np.concatenate([b["input_ids"] for b in batches], 0)
    dense_ppl = evaluate_perplexity(params, spec, ids, cfg.n_calib_samples)
    cfg = cfg.replace(ppl_target=float(dense_ppl) * 1.15)

    out = diff.run_differential(cfg, str(tmp_path), family="llama")
    _assert_parity(out)
    assert out["ours"]["ppl"] < cfg.ppl_target * 1.05


def test_llama_tied_head_parity(tmp_path):
    """Weight-tied model: the reference factorizes the tied lm_head module
    (breaking the tie for the head only); ours must do the same."""
    out = diff.run_differential(_cfg(param_ratio_target=0.8, seed=7),
                                str(tmp_path), family="llama", tie=True)
    _assert_parity(out)


def test_llama_sigma_fuse_u_parity(tmp_path):
    """sigma_fuse='U' (A=U·S, B=Vh; ref modules/svd_linear.py:19-21):
    same recomposed weight, different factor split — manifest and PPL must
    still match the oracle."""
    out = diff.run_differential(_cfg(param_ratio_target=0.85,
                                     sigma_fuse="U"),
                                str(tmp_path), family="llama")
    _assert_parity(out)


def test_llama_no_act_aware_parity(tmp_path):
    """act_aware=False: the scan STAYS act-aware (the reference's quirk,
    ref sensitivity.py:50) but the search's trial/final SVDs drop the
    scaling (ref binary_search.py from_linear(act_aware=args.act_aware))."""
    out = diff.run_differential(_cfg(param_ratio_target=0.85,
                                     act_aware=False),
                                str(tmp_path), family="llama")
    _assert_parity(out)


def test_llama_rtn_int8_quant_parity(tmp_path):
    """Quantization-stage oracle (VERDICT r2 #2): ref Quantizer /
    rtn_quant_sequential (ref quantization.py:17-175) vs ops/quant.py on
    the post-search model — unit-exact on identical inputs, end-to-end
    PPL match."""
    out = diff.run_quant_differential(_cfg(param_ratio_target=0.85),
                                      str(tmp_path), 8, family="llama")
    assert not out["problems"], "\n".join(out["problems"])


def test_llama_rtn_int6_quant_parity(tmp_path):
    out = diff.run_quant_differential(_cfg(param_ratio_target=0.8, seed=11),
                                      str(tmp_path), 6, family="llama")
    assert not out["problems"], "\n".join(out["problems"])


def test_mse_grid_quantizer_parity():
    """The MSE shrink-grid search path (ref quantization.py:94-111) has no
    caller in rtn_quant_sequential but is part of the Quantizer surface —
    pin it against the oracle on random matrices, int8 and int4."""
    import numpy as np

    from asvd4llm_tpu.ops.quant import _fake_quant, find_quant_params

    ref = diff.load_reference()
    rng = np.random.RandomState(3)
    for bits in (8, 4):
        w = rng.randn(16, 24).astype(np.float32) * \
            rng.gamma(1.0, 1.0, size=(16, 1)).astype(np.float32)
        q = ref.quant.Quantizer()
        q.configure(bits, perchannel=True, sym=False, mse=True)
        t = torch.from_numpy(w.copy())
        q.find_params(t, weight=True)
        ref_q = q.quantize(t).numpy()

        qp = find_quant_params(w, bits, mse=True)
        our_q = np.asarray(_fake_quant(w, qp.scale, qp.zero, qp.maxq))
        np.testing.assert_allclose(our_q, ref_q, rtol=1e-5, atol=1e-6)


def test_stable_rank_parity(tmp_path):
    """Stable-rank sensitivity proxy vs the oracle
    (ref sensitivity.py:64-110), llama and OPT."""
    for family in ("llama", "opt"):
        out = diff.run_stable_rank_differential(_cfg(), str(tmp_path),
                                                family=family)
        assert not out["problems"], "\n".join(out["problems"])
        assert "lm_head" in out["ref"]
