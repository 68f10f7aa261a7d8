"""Sensitivity scan + binary-search rank allocation tests.

Includes a pure-bookkeeping parity test of the search cut selection against
a literal numpy re-derivation of ref binary_search.py:42-110, and an
end-to-end tiny-model pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.calib.search import binary_search_truncation_rank  # noqa: E402
from asvd4llm_tpu.calib.sensitivity import (  # noqa: E402
    calib_sensitivity_ppl, calib_sensitivity_stable_rank,
)
from asvd4llm_tpu.calib.stats import calib_input_distribution  # noqa: E402
from asvd4llm_tpu.config import ASVDConfig  # noqa: E402
from asvd4llm_tpu.eval.ppl import evaluate_perplexity  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    count_linear_params, is_lowrank, iter_linears, get_linear,
)
from asvd4llm_tpu.ops.asvd import rank_for_param_ratio  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


def _loader(n, vocab=128, L=32, seed=0):
    rng = np.random.RandomState(seed)
    return [{"input_ids": rng.randint(0, vocab, size=(1, L))} for _ in range(n)]


def ref_cut_config(sensitivity_dict, numels, ratio_target, kv=False):
    """Literal re-derivation of the reference's param-ratio binary search
    (ref binary_search.py:42-110) returning the final per-layer ratios."""
    default = 2 if kv else 1
    slist = []
    for layername, v in sensitivity_dict.items():
        for r, ppl in v.items():
            if not kv and r >= 1:
                continue
            slist.append((layername, r, ppl))
    slist = sorted(slist, key=lambda x: -x[2])
    low, high = 0, len(slist) - 1
    mid = (low + high) // 2
    while low < high:
        mid = (low + high) // 2
        ratios = {n: default for n in sensitivity_dict}
        for n, r, _ in slist[mid:]:
            ratios[n] = min(ratios[n], r)
        # naive += like the reference, NOT builtin sum() (compensated
        # since py3.12) — the last ulp decides knife-edge branches
        tot = 0
        comp = 0
        for n, r in ratios.items():
            tot += numels[n]
            comp += numels[n] * r
        now = comp / tot / (2 if kv else 1)
        if now > ratio_target:
            high = mid
        else:
            low = mid + 1
    ratios = {n: default for n in sensitivity_dict}
    for n, r, _ in slist[mid:]:
        ratios[n] = min(ratios[n], r)
    return ratios


def test_param_ratio_search_matches_reference_bookkeeping(tiny):
    params, spec = tiny
    rng = np.random.RandomState(7)
    names = [n for n, _ in iter_linears(params, spec)]
    sensitivity = {n: {r: float(rng.uniform(10, 100) * (1.05 - r))
                       for r in [0.4, 0.5, 0.6, 0.7, 0.8, 0.9]}
                   for n in names}
    numels = {n: int(np.prod(l["w"].shape)) for n, l in iter_linears(params, spec)}

    cfg = ASVDConfig(model_id="t", param_ratio_target=0.8, rank_align=1)
    _, manifest = binary_search_truncation_rank(
        params, spec, sensitivity, _loader(2), cfg)
    ref_ratios = ref_cut_config(sensitivity, numels, 0.8)

    for name, r in ref_ratios.items():
        o, i = get_linear(params, spec, name)["w"].shape
        expected = min(rank_for_param_ratio(i, o, r, 1), i, o) if r != 1 else None
        assert manifest.get(name) == expected, name


def test_kv_mode_filters_and_halves(tiny):
    params, spec = tiny
    names = [n for n, _ in iter_linears(params, spec)]
    rng = np.random.RandomState(8)
    grid = [round(0.1 * i, 10) for i in range(1, 20)]
    sensitivity = {n: {r: float(rng.uniform(10, 100) / r) for r in grid}
                   for n in names}
    cfg = ASVDConfig(model_id="t", compress_kv_cache=True,
                     kv_cache_ratio_target=0.5)
    out, manifest = binary_search_truncation_rank(
        params, spec, sensitivity, _loader(2), cfg)
    assert manifest, "kv search should compress something"
    assert all(("k_proj" in n or "v_proj" in n) for n in manifest)
    # realized kv rank ratio <= target (approximately, quantized by grid)
    tot = comp = 0
    for n, leaf in iter_linears(out, spec):
        if "k_proj" in n or "v_proj" in n:
            if is_lowrank(leaf):
                o, i = leaf["A"].shape[0], leaf["B"].shape[1]
                tot += o * i
                comp += leaf["A"].size + leaf["B"].size
            else:
                tot += leaf["w"].size
                comp += 2 * leaf["w"].size  # default ratio 2
    assert comp / tot / 2 <= 0.55


def test_end_to_end_pipeline_tiny(tiny, tmp_path):
    """calibrate -> sensitivity -> search -> compressed model with lower
    params and bounded PPL regression."""
    params, spec = tiny
    loader = _loader(3, L=48, seed=3)
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9, act_aware=True,
                     alpha=0.5, n_calib_samples=3, svd_backend="exact")

    stats = calib_input_distribution(params, spec, loader, "abs_mean")
    sens = calib_sensitivity_ppl(params, spec, loader, cfg, stats=stats)
    assert all(len(v) == 6 for v in sens.values())

    out, manifest = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats)
    assert manifest, "should compress at least one layer"

    p_before = count_linear_params(params, spec)
    p_after = count_linear_params(out, spec)
    # the reference's final config reuses the last loop `mid`, which can
    # land one grid step above the target on coarse grids (parity quirk) —
    # so only require real compression, not exact target attainment
    assert p_after < p_before

    ids = np.concatenate([b["input_ids"] for b in loader], 0)
    ppl_dense = evaluate_perplexity(params, spec, ids)
    ppl_comp = evaluate_perplexity(out, spec, ids)
    # random tiny model: just require no catastrophic blowup
    assert ppl_comp < ppl_dense * 3


def test_stable_rank_sensitivity(tiny):
    params, spec = tiny
    sens = calib_sensitivity_stable_rank(params, spec, _loader(1),
                                         ASVDConfig(model_id="t"))
    names = [n for n, _ in iter_linears(params, spec, include_extras=True)]
    assert set(sens) == set(names)
    assert "lm_head" in sens
    for n, d in sens.items():
        assert len(d) == 9
        # score = -sr * r**0.1 is increasing in magnitude with r... i.e.
        # more negative at higher ratio
        rs = sorted(d)
        assert d[rs[0]] > d[rs[-1]]


def test_sensitivity_cache_roundtrip(tiny, tmp_path):
    from asvd4llm_tpu.utils.cache import ArtifactCache
    params, spec = tiny
    loader = _loader(2, L=24)
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9,
                     svd_backend="exact")
    cache = ArtifactCache(str(tmp_path))
    s1 = calib_sensitivity_ppl(params, spec, loader, cfg, cache=cache)
    s2 = calib_sensitivity_ppl(params, spec, [], cfg, cache=cache)
    assert s1.keys() == s2.keys()
    for k in s1:
        assert s1[k] == pytest.approx(s2[k])


def test_ppl_target_mode(tiny):
    """ppl-target search: decomposes trial configs and evaluates calib PPL
    (ref binary_search.py:64-87). The chosen config's PPL should respect
    the target direction."""
    params, spec = tiny
    loader = _loader(2, L=32, seed=9)
    ids = np.concatenate([b["input_ids"] for b in loader], 0)
    from asvd4llm_tpu.eval.ppl import evaluate_perplexity
    base_ppl = evaluate_perplexity(params, spec, ids)

    from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_ppl
    cfg_s = ASVDConfig(model_id="t", ppl_target=base_ppl * 1.5,
                       act_aware=False, n_calib_samples=2,
                       svd_backend="exact")
    sens = calib_sensitivity_ppl(params, spec, loader, cfg_s)
    out, manifest = binary_search_truncation_rank(
        params, spec, sens, loader, cfg_s)
    # must compress something and stay a working model
    assert manifest
    final = evaluate_perplexity(out, spec, ids)
    assert np.isfinite(final)


def test_batched_ratio_scan_matches_serial(tiny):
    """batch_ratios=True must produce identical sensitivity values to the
    serial reference-style loop (same math, vmapped)."""
    params, spec = tiny
    loader = _loader(2, L=24, seed=11)
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9,
                     svd_backend="exact", n_calib_samples=2)
    s_batched = calib_sensitivity_ppl(params, spec, loader, cfg,
                                      batch_ratios=True)
    s_serial = calib_sensitivity_ppl(params, spec, loader, cfg,
                                     batch_ratios=False)
    assert s_batched.keys() == s_serial.keys()
    for name in s_batched:
        for r in s_batched[name]:
            assert s_batched[name][r] == pytest.approx(s_serial[name][r],
                                                       rel=1e-4), (name, r)


def test_naive_param_accumulation_matches_reference():
    """The search's compressed-params accumulation must bit-replicate the
    reference's naive `+=` loop (ref binary_search.py:90-93). Builtin
    sum() is Neumaier-compensated since Python 3.12 and rounds the SAME
    terms differently in the last ulp — which flipped the branch at the
    production-differential knife edge (now_ratio 0.8500000000000001 vs
    0.85 against target 0.85)."""
    from asvd4llm_tpu.calib.search import naive_compressed_params

    numels = {"a": 3145728, "b": 3145728, "c": 3145728,
              "d": 3145728, "e": 3145728, "f": 2359296}
    ratios = {"a": 0.5, "b": 0.5, "c": 0.2, "d": 0.6, "e": 0.4, "f": 0.5}
    comp, tot = naive_compressed_params(numels, ratios)
    assert tot == sum(numels.values())
    # the naive loop's value...
    expect = 0
    for n, r in ratios.items():
        expect += numels[n] * r
    assert comp == expect
    # ...and it genuinely differs from compensated sum() on these terms,
    # so a "simplification" back to sum() breaks this test
    assert comp != sum(numels[n] * r for n, r in ratios.items())


@pytest.mark.parametrize("family", ["llama", "opt350"])
def test_reference_walk_order_matches_torch_walk(family):
    """reference_walk_order must reproduce the reference's stack-DFS
    nn.Module walk (ref sensitivity.py:14-33): lm_head first, layers
    descending, mlp linears before attention (llama) / fc1,fc2 then
    k,v,q,out (OPT incl. project_out/project_in). The stable sort's
    tie-break and the float accumulation order both depend on it."""
    import torch.nn as nn

    from asvd4llm_tpu.models.registry import (
        linear_names, reference_walk_order,
    )

    torch.manual_seed(0)
    if family == "llama":
        model = transformers.LlamaForCausalLM(transformers.LlamaConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=3, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=64))
    else:
        model = transformers.OPTForCausalLM(transformers.OPTConfig(
            vocab_size=64, hidden_size=16, ffn_dim=32,
            num_hidden_layers=3, num_attention_heads=2,
            max_position_embeddings=64, word_embed_proj_dim=8))
    params, spec = params_from_torch_model(model, dtype=jnp.float32)

    expected = []
    stack = [model]
    mod_names = {m: n for n, m in model.named_modules()}
    while stack:
        sub = stack.pop()
        for _, child in sub.named_children():
            if isinstance(child, nn.Linear):
                expected.append(mod_names[child])
            else:
                stack.append(child)

    names = linear_names(params, spec, include_extras=True)
    got = reference_walk_order(params, spec, names)
    assert got == expected


def test_kv_mode_realizes_ratios_above_one(tiny):
    """KV grid ratios run past 1.0 (params grow, the rank-dim cache still
    shrinks, ref sensitivity.py:36-37). The final decompose must realize
    the reference rank formula for those ratios — the max-rank SVD cache
    once dropped >=1 ratios and silently truncated a chosen ratio-1.4
    layer to the ratio-1.0 rank (caught by the production-shape KV
    differential)."""
    params, spec = tiny
    names = [n for n, _ in iter_linears(params, spec)]
    rng = np.random.RandomState(3)
    grid = [round(0.1 * i, 10) for i in range(1, 20)]
    sensitivity = {n: {r: float(rng.uniform(10, 100) / r) for r in grid}
                   for n in names}
    # a mild target forces chosen ratios well above 1.0 (target ~ r/2)
    cfg = ASVDConfig(model_id="t", compress_kv_cache=True,
                     kv_cache_ratio_target=0.85)
    out, manifest = binary_search_truncation_rank(
        params, spec, sensitivity, _loader(2), cfg)
    assert manifest
    rank_10 = {}
    for n in manifest:
        leaf = get_linear(params, spec, n)
        o, i = leaf["w"].shape
        rank_10[n] = min(rank_for_param_ratio(i, o, 1.0, cfg.rank_align),
                         i, o)
    # with target 0.85 at least one layer must land above the ratio-1.0
    # rank — under the truncation bug every rank clamped to rank_10
    assert any(manifest[n] > rank_10[n] for n in manifest), \
        (manifest, rank_10)
    # and every realized low-rank leaf's shapes match its manifest rank
    for n, r in manifest.items():
        leaf = get_linear(out, spec, n)
        assert is_lowrank(leaf) and leaf["A"].shape[1] == r


def test_chunked_grid_eval_matches_full(tiny, monkeypatch):
    """The TPU HBM guard chunks the candidate axis of the batched grid
    evaluators at host level (calib/sensitivity.py::_grid_chunk_bytes — the r4
    full-depth probe OOM). Chunked evaluation must be numerically
    identical to the full-width vmap."""
    import asvd4llm_tpu.calib.sensitivity as S
    params, spec = tiny
    loader = _loader(2, L=24, seed=13)
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9,
                     svd_backend="exact", n_calib_samples=2)
    full = calib_sensitivity_ppl(params, spec, loader, cfg)
    monkeypatch.setattr(S, "_grid_chunk_bytes",
                        lambda C, cand, resident, mesh: 2)
    chunked = calib_sensitivity_ppl(params, spec, loader, cfg)
    assert full.keys() == chunked.keys()
    for name in full:
        for r in full[name]:
            assert chunked[name][r] == pytest.approx(full[name][r],
                                                     rel=1e-5), (name, r)


def test_free_stacked_scan_matches_and_frees(tiny):
    """free_stacked=True (pipeline host-master mode) must delete the
    stacked buffers before the lm_head grid without changing any
    sensitivity value."""
    import jax
    from asvd4llm_tpu.models.scan_forward import stack_layers
    params, spec = tiny
    loader = _loader(2, L=24, seed=14)
    cfg = ASVDConfig(model_id="t", param_ratio_target=0.9,
                     svd_backend="exact", n_calib_samples=2)
    base = calib_sensitivity_ppl(params, spec, loader, cfg)
    stacked = stack_layers(params, spec)
    freed = calib_sensitivity_ppl(params, spec, loader, cfg,
                                  stacked=stacked, free_stacked=True)
    assert all(leaf.is_deleted() for leaf in jax.tree.leaves(stacked))
    assert base.keys() == freed.keys()
    for name in base:
        for r in base[name]:
            assert freed[name][r] == pytest.approx(base[name][r],
                                                   rel=1e-5), (name, r)
