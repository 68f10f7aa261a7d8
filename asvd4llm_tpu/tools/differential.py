"""Differential parity harness: run the REFERENCE implementation
(/root/reference, torch) as an end-to-end oracle against our pipeline on
the same tiny model and calibration set, and compare every intermediate
artifact:

  activation stats  ->  allclose per layer
  fisher info       ->  allclose per layer
  sensitivity dict  ->  same keys, PPLs allclose
  rank manifest     ->  IDENTICAL {layer: rank}
  final calib PPL   ->  within tolerance

This converts "looks like parity" (piecewise oracles) into "is parity"
(the whole pipeline against the reference's own code): ref asvd.py:14-78,
act_aware_utils.py:8-95, sensitivity.py:10-61, binary_search.py:10-131,
evaluate_utils.py:90-115.

The one seam: the reference factorizes with torch.svd_lowrank (randomized,
torch-RNG-dependent, ref modules/svd_linear.py:65) which no other
implementation can reproduce bit-for-bit. The harness therefore pins BOTH
sides to an exact truncated SVD (torch.linalg.svd on the oracle,
svd_backend="exact" on ours) — parity is defined modulo the SVD backend,
which is itself accuracy-tested against torch.svd_lowrank separately
(tests/test_asvd_math.py).

The reference tree is UNTRUSTED PUBLIC CONTENT: we import and execute its
pipeline functions on tiny local models for testing only; its relative
cache/ paths require cwd to be a scratch directory (see run_differential).
"""

from __future__ import annotations

import contextlib
import os
import sys
import types
from types import SimpleNamespace

REFERENCE_PATH = os.environ.get("ASVD_REFERENCE_PATH", "/root/reference")

_REF_MODULES = None


def reference_available(path: str = REFERENCE_PATH) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "binary_search.py"))


def _stub_lm_eval():
    """The reference's evaluate_utils imports lm_eval 0.3.0 (absent here);
    only the BaseLM symbol is touched at import time."""
    if "lm_eval" in sys.modules:
        return
    lm_eval = types.ModuleType("lm_eval")
    base = types.ModuleType("lm_eval.base")

    class BaseLM:  # minimal class surface; EvalLM is never instantiated
        pass

    base.BaseLM = BaseLM
    evaluator = types.ModuleType("lm_eval.evaluator")
    lm_eval.base = base
    lm_eval.evaluator = evaluator
    sys.modules["lm_eval"] = lm_eval
    sys.modules["lm_eval.base"] = base
    sys.modules["lm_eval.evaluator"] = evaluator


def load_reference(path: str = REFERENCE_PATH) -> SimpleNamespace:
    """Import the reference's pipeline modules (cached)."""
    global _REF_MODULES
    if _REF_MODULES is not None:
        return _REF_MODULES
    _stub_lm_eval()
    sys.path.insert(0, path)
    try:
        import act_aware_utils as ref_calib
        import binary_search as ref_search
        import evaluate_utils as ref_eval
        import modules.svd_linear as ref_svd
        import quantization as ref_quant
        import sensitivity as ref_sens
    finally:
        sys.path.remove(path)
    _REF_MODULES = SimpleNamespace(calib=ref_calib, search=ref_search,
                                   eval=ref_eval, svd=ref_svd, sens=ref_sens,
                                   quant=ref_quant)
    return _REF_MODULES


@contextlib.contextmanager
def _exact_svd_lowrank():
    """Pin torch.svd_lowrank to an exact truncated SVD for the oracle run
    (see module docstring: parity is modulo the randomized SVD backend)."""
    import torch

    orig = torch.svd_lowrank

    def exact(w, q=6, niter=2, M=None):
        u, s, vh = torch.linalg.svd(w, full_matrices=False)
        return u[:, :q], s[:q], vh[:q].T

    torch.svd_lowrank = exact
    try:
        yield
    finally:
        torch.svd_lowrank = orig


def make_args_namespace(cfg) -> SimpleNamespace:
    """Our typed config -> the reference's argparse namespace surface."""
    return SimpleNamespace(
        ppl_target=cfg.ppl_target,
        param_ratio_target=cfg.param_ratio_target,
        act_aware=cfg.act_aware,
        alpha=cfg.alpha,
        sigma_fuse=cfg.sigma_fuse,
        rank_align=cfg.rank_align,
        n_calib_samples=cfg.n_calib_samples,
        calib_dataset=cfg.calib_dataset,
        scaling_method=cfg.scaling_method,
        compress_kv_cache=cfg.compress_kv_cache,
        kv_cache_ratio_target=cfg.kv_cache_ratio_target,
        use_cache=False,
        seed=cfg.seed,
    )


def synthetic_calib_batches(nsamples: int, seqlen: int, vocab: int,
                            seed: int = 0) -> list[dict]:
    """Equal-length random windows as numpy — fed identically to both
    pipelines (reference loader contract, ref datautils.py:106-160)."""
    import numpy as np

    from asvd4llm_tpu.data.datasets import synthetic_token_corpus

    corpus = synthetic_token_corpus(max(nsamples * seqlen * 2, 4 * seqlen),
                                    vocab, seed=seed)
    import random
    rng = random.Random(seed)
    out = []
    for _ in range(nsamples):
        i = rng.randint(0, len(corpus) - seqlen - 1)
        ids = corpus[i:i + seqlen][None, :]
        out.append({"input_ids": ids,
                    "attention_mask": np.ones_like(ids)})
    return out


def run_reference_pipeline(model, calib_batches, cfg, workdir: str) -> dict:
    """Run the reference calib -> sensitivity -> search IN PLACE on a torch
    model; returns {stats, fisher, sensitivity, manifest, ppl}.

    workdir: scratch cwd for the reference's hardcoded relative cache/
    paths (ref act_aware_utils.py:10,50, sensitivity.py:13)."""
    import torch
    import torch.nn as nn

    ref = load_reference()
    args = make_args_namespace(cfg)
    loader = [{k: torch.from_numpy(v.copy()) for k, v in b.items()}
              for b in calib_batches]

    prev_cwd = os.getcwd()
    os.makedirs(os.path.join(workdir, "cache"), exist_ok=True)
    os.chdir(workdir)
    try:
        with _exact_svd_lowrank(), torch.random.fork_rng():
            torch.manual_seed(cfg.seed)
            if "fisher" in cfg.scaling_method:
                ref.calib.calib_fisher_info(model, loader, use_cache=False)
            if "abs" in cfg.scaling_method:
                ref.calib.calib_input_distribution(
                    model, loader, cfg.scaling_method, use_cache=False)

            stats, fisher = {}, {}
            for name, mod in model.named_modules():
                if isinstance(mod, nn.Linear):
                    if hasattr(mod, "scaling_diag_matrix") and \
                            not isinstance(mod.scaling_diag_matrix, int):
                        stats[name] = mod.scaling_diag_matrix.detach().numpy().copy()
                    if hasattr(mod, "fisher_info") and \
                            not isinstance(mod.fisher_info, int):
                        fisher[name] = mod.fisher_info.detach().numpy().copy()

            sens = ref.sens.calib_sensitivity_ppl(model, loader, args,
                                                  use_cache=False)
            ref.search.binary_search_truncation_rank(model, sens, loader, args)

            manifest = {name: int(mod.truncation_rank)
                        for name, mod in model.named_modules()
                        if isinstance(mod, ref.svd.SVDLinear)}
            input_ids = torch.cat([b["input_ids"] for b in loader], 0)
            ppl = float(ref.eval.evaluate_perplexity(model, input_ids,
                                                     cfg.n_calib_samples))
    finally:
        os.chdir(prev_cwd)
    return {"stats": stats, "fisher": fisher,
            "sensitivity": {k: dict(v) for k, v in sens.items()},
            "manifest": manifest, "ppl": ppl}


def run_our_pipeline(torch_model, calib_batches, cfg) -> dict:
    """Run our pipeline on the SAME torch model (converted before the
    reference mutates it); returns the same artifact dict."""
    import jax.numpy as jnp
    import numpy as np

    from asvd4llm_tpu.calib.fisher import calib_fisher_info
    from asvd4llm_tpu.calib.search import binary_search_truncation_rank
    from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_ppl
    from asvd4llm_tpu.calib.stats import calib_input_distribution
    from asvd4llm_tpu.eval.ppl import evaluate_perplexity
    from asvd4llm_tpu.models import params_from_torch_model

    params, spec = params_from_torch_model(torch_model, dtype=jnp.float32)

    stats = fisher = None
    if "fisher" in cfg.scaling_method:
        fisher = calib_fisher_info(params, spec, calib_batches,
                                   include_extras=cfg.compress_all_linears,
                                   double_shift=cfg.fisher_double_shift)
    if "abs" in cfg.scaling_method:
        stats = calib_input_distribution(params, spec, calib_batches,
                                         cfg.scaling_method)

    sens = calib_sensitivity_ppl(params, spec, calib_batches, cfg,
                                 stats=stats, fisher=fisher)
    compressed, manifest = binary_search_truncation_rank(
        params, spec, sens, calib_batches, cfg, stats=stats, fisher=fisher)
    input_ids = np.concatenate([np.asarray(b["input_ids"])
                                for b in calib_batches], axis=0)
    ppl = float(evaluate_perplexity(compressed, spec, input_ids,
                                    cfg.n_calib_samples))
    return {"stats": {} if stats is None else
            {k: np.asarray(v) for k, v in stats.items()},
            "fisher": {} if fisher is None else
            {k: np.asarray(v) for k, v in fisher.items()},
            "sensitivity": sens, "manifest": dict(manifest), "ppl": ppl,
            # post-search state for downstream differentials (quantization,
            # cut-boundary attribution); compare() ignores unknown keys
            "compressed": compressed, "spec": spec, "raw_params": params,
            "stats_jax": stats, "fisher_jax": fisher}


def compare(ref: dict, ours: dict, *, stats_rtol=2e-3, ppl_rtol=1e-3,
            sens_rtol=5e-3) -> list[str]:
    """Returns a list of mismatch descriptions (empty = full parity)."""
    import numpy as np

    problems: list[str] = []

    for field, rtol in (("stats", stats_rtol), ("fisher", stats_rtol)):
        r, o = ref[field], ours[field]
        if set(r) != set(o):
            problems.append(f"{field} keys differ: only-ref="
                            f"{sorted(set(r) - set(o))} only-ours="
                            f"{sorted(set(o) - set(r))}")
            continue
        for k in r:
            if not np.allclose(o[k], r[k], rtol=rtol, atol=1e-6):
                err = float(np.max(np.abs(o[k] - r[k]) /
                                   (np.abs(r[k]) + 1e-6)))
                problems.append(f"{field}[{k}] mismatch (max rel err {err:.2e})")

    r, o = ref["sensitivity"], ours["sensitivity"]
    if set(r) != set(o):
        problems.append(f"sensitivity keys differ: only-ref="
                        f"{sorted(set(r) - set(o))} only-ours="
                        f"{sorted(set(o) - set(r))}")
    else:
        for k in r:
            ratios_r = sorted(r[k])
            ratios_o = sorted(o[k])
            if [round(x, 6) for x in ratios_r] != [round(x, 6) for x in ratios_o]:
                problems.append(f"sensitivity[{k}] ratio grids differ")
                continue
            for rr, ro in zip(ratios_r, ratios_o):
                pr, po = float(r[k][rr]), float(o[k][ro])
                if not np.isfinite(pr) or not np.isfinite(po):
                    if np.isfinite(pr) != np.isfinite(po):
                        problems.append(
                            f"sensitivity[{k}][{rr}] finite-ness differs "
                            f"(ref {pr}, ours {po})")
                    continue
                if abs(po - pr) > sens_rtol * abs(pr) + 1e-6:
                    problems.append(f"sensitivity[{k}][{rr}]: ref {pr:.6f} "
                                    f"vs ours {po:.6f}")

    if ref["manifest"] != ours["manifest"]:
        only_r = {k: v for k, v in ref["manifest"].items()
                  if ours["manifest"].get(k) != v}
        only_o = {k: v for k, v in ours["manifest"].items()
                  if ref["manifest"].get(k) != v}
        problems.append(f"rank manifest differs: ref-side {only_r} "
                        f"ours-side {only_o}")

    if abs(ours["ppl"] - ref["ppl"]) > ppl_rtol * abs(ref["ppl"]):
        problems.append(f"final ppl: ref {ref['ppl']:.6f} vs ours "
                        f"{ours['ppl']:.6f}")
    return problems


def build_tiny_torch_model(family: str, seed: int, *, hidden: int = 32,
                           layers: int = 2, heads: int = 2, kv_heads: int = 2,
                           vocab: int = 128, seqlen: int = 24,
                           inter: int = 0, tie: bool = False):
    """A tiny random HF model — the shared subject for every differential."""
    import torch
    import transformers

    torch.manual_seed(seed)
    inter = inter or 2 * hidden
    if family == "llama":
        hf_cfg = transformers.LlamaConfig(
            vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=kv_heads, max_position_embeddings=4 * seqlen,
            tie_word_embeddings=tie)
        model = transformers.LlamaForCausalLM(hf_cfg).eval()
    elif family == "opt":
        hf_cfg = transformers.OPTConfig(
            vocab_size=vocab, hidden_size=hidden, ffn_dim=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            max_position_embeddings=4 * seqlen, word_embed_proj_dim=hidden,
            tie_word_embeddings=tie)
        model = transformers.OPTForCausalLM(hf_cfg).eval()
    else:
        raise ValueError(family)
    return model.float()


def run_differential(cfg, workdir: str, *, family: str = "llama",
                     hidden: int = 32, layers: int = 2, heads: int = 2,
                     kv_heads: int = 2, vocab: int = 128,
                     seqlen: int = 24, inter: int = 0,
                     tie: bool = False) -> dict:
    """Build a tiny random model, run both pipelines, compare. Returns
    {"problems": [...], "ref": ..., "ours": ...}."""
    model = build_tiny_torch_model(family, cfg.seed, hidden=hidden,
                                   layers=layers, heads=heads,
                                   kv_heads=kv_heads, vocab=vocab,
                                   seqlen=seqlen, inter=inter, tie=tie)
    batches = synthetic_calib_batches(cfg.n_calib_samples, seqlen, vocab,
                                      seed=cfg.seed)
    # ours first: the reference run mutates the torch model in place
    ours = run_our_pipeline(model, batches, cfg)
    ref = run_reference_pipeline(model, batches, cfg, workdir)
    problems = compare(ref, ours)
    boundary_note = None
    if any(p.startswith("rank manifest differs") for p in problems):
        # Cut-boundary attribution: the binary search is DISCONTINUOUS in
        # its inputs — near-tied sensitivity PPLs (matching within
        # tolerance but not bitwise across torch and XLA f32) can reorder
        # the sort at the cut index and flip one layer's assignment. Run
        # OUR search on the REFERENCE's sensitivity dict: if it reproduces
        # the reference manifest EXACTLY, the bookkeeping is
        # input-equivalent and the original diff is eval-noise at the
        # boundary; final-PPL parity is then checked on the
        # manifest-matched model instead.
        import numpy as np

        from asvd4llm_tpu.calib.search import binary_search_truncation_rank
        from asvd4llm_tpu.eval.ppl import evaluate_perplexity

        ref_sens = {k: {float(r): float(v) for r, v in d.items()}
                    for k, d in ref["sensitivity"].items()}
        cross, cross_manifest = binary_search_truncation_rank(
            ours["raw_params"], ours["spec"], ref_sens, batches, cfg,
            stats=ours["stats_jax"], fisher=ours["fisher_jax"])
        if dict(cross_manifest) == ref["manifest"]:
            input_ids = np.concatenate(
                [np.asarray(b["input_ids"]) for b in batches], axis=0)
            cross_ppl = float(evaluate_perplexity(
                cross, ours["spec"], input_ids, cfg.n_calib_samples))
            problems = [p for p in problems
                        if not p.startswith("rank manifest differs")
                        and not p.startswith("final ppl")]
            if abs(cross_ppl - ref["ppl"]) > 1e-3 * abs(ref["ppl"]):
                problems.append(
                    f"final ppl (manifest-matched): ref {ref['ppl']:.6f} "
                    f"vs ours {cross_ppl:.6f}")
            only_r = {k: v for k, v in ref["manifest"].items()
                      if ours["manifest"].get(k) != v}
            only_o = {k: v for k, v in ours["manifest"].items()
                      if ref["manifest"].get(k) != v}
            boundary_note = (
                f"manifest differed at the sort-cut boundary "
                f"(ref-side {only_r} ours-side {only_o}); our search on the "
                f"reference's sensitivity dict reproduces the reference "
                f"manifest exactly, and the manifest-matched model's calib "
                f"PPL is {cross_ppl:.6f} vs ref {ref['ppl']:.6f}")
    return {"problems": problems, "ref": ref, "ours": ours,
            "model": model, "batches": batches,
            "boundary_note": boundary_note}


def _torch_layer_linears(model) -> dict:
    """{our-style full name: torch nn.Linear} for every linear inside the
    decoder layers (incl. SVDLinear's ALinear/BLinear children) — the set
    rtn_quant_sequential quantizes (ref quantization.py:160-172)."""
    import torch.nn as nn

    dec = getattr(model.model, "decoder", None)
    container = dec.layers if dec is not None else model.model.layers
    prefix = "model.decoder.layers" if dec is not None else "model.layers"
    out = {}
    for i, layer in enumerate(container):
        for name, mod in layer.named_modules():
            if isinstance(mod, nn.Linear):
                out[f"{prefix}.{i}.{name}"] = mod
    return out


def run_quant_differential(cfg, workdir: str, wbits: int, *,
                           family: str = "llama", seqlen: int = 24) -> dict:
    """Quantization-stage oracle: after a parity-checked compress run,
    (a) the reference's Quantizer applied to OUR post-search factors must
    reproduce our fake-quant bitwise-close (same fp32 input, same math:
    ref quantization.py:17-21,52-133 vs ops/quant.py), and (b) the ref's
    rtn_quant_sequential end state must match our quantize_model_weights
    in final calib PPL. Returns {"problems": [...], ...}."""
    import numpy as np
    import torch

    from asvd4llm_tpu.eval.ppl import evaluate_perplexity
    from asvd4llm_tpu.models.registry import is_lowrank, iter_linears
    from asvd4llm_tpu.ops.quant import rtn_quantize_weight
    from asvd4llm_tpu.ops.quant_apply import quantize_model_weights

    out = run_differential(cfg, workdir, family=family, seqlen=seqlen)
    problems = list(out["problems"])
    model, batches = out["model"], out["batches"]
    compressed, spec = out["ours"]["compressed"], out["ours"]["spec"]
    ref = load_reference()

    # (a) unit parity on identical inputs: every decoder linear of OUR
    # compressed model through the reference Quantizer
    for name, leaf in iter_linears(compressed, spec):
        mats = [("A", leaf["A"]), ("B", leaf["B"])] if is_lowrank(leaf) \
            else [("w", leaf["w"])]
        for part, w in mats:
            w_np = np.asarray(w, dtype=np.float32)
            q = ref.quant.Quantizer()
            q.configure(wbits, perchannel=True, sym=False, mse=False)
            t = torch.from_numpy(w_np.copy())
            q.find_params(t, weight=True)
            ref_q = q.quantize(t).numpy()
            our_q = np.asarray(rtn_quantize_weight(w, wbits))
            if not np.allclose(our_q, ref_q, rtol=1e-5, atol=1e-6):
                err = float(np.max(np.abs(our_q - ref_q)))
                problems.append(
                    f"quant[{name}.{part}] int{wbits} mismatch "
                    f"(max abs err {err:.3e})")

    # (b) end-to-end: ref rtn_quant_sequential (keys its layer walk off
    # config._name_or_path, ref quantization.py:160-163) vs ours
    model.config._name_or_path = family
    with torch.no_grad():
        ref.quant.rtn_quant_sequential(model, wbits)
    loader = [{k: torch.from_numpy(v.copy()) for k, v in b.items()}
              for b in batches]
    input_ids_t = torch.cat([b["input_ids"] for b in loader], 0)
    ref_ppl_q = float(ref.eval.evaluate_perplexity(model, input_ids_t,
                                                   cfg.n_calib_samples))
    ours_q = quantize_model_weights(compressed, spec, f"rtn_int{wbits}")
    input_ids = np.concatenate([np.asarray(b["input_ids"]) for b in batches],
                               axis=0)
    our_ppl_q = float(evaluate_perplexity(ours_q, spec, input_ids,
                                          cfg.n_calib_samples))
    if abs(our_ppl_q - ref_ppl_q) > 2e-3 * abs(ref_ppl_q):
        problems.append(f"quantized ppl: ref {ref_ppl_q:.6f} vs ours "
                        f"{our_ppl_q:.6f}")

    # loose weight agreement (inputs differ at fp rounding level, so a
    # tiny fraction of entries may flip one quant step)
    ref_lin = _torch_layer_linears(model)
    for name, leaf in iter_linears(ours_q, spec):
        mats = [(f"{name}.ALinear", leaf.get("A")),
                (f"{name}.BLinear", leaf.get("B"))] if is_lowrank(leaf) \
            else [(name, leaf["w"])]
        for rname, w in mats:
            mod = ref_lin.get(rname)
            if mod is None:
                problems.append(f"ref missing quantized linear {rname}")
                continue
            r = mod.weight.detach().numpy()
            o = np.asarray(w)
            step = np.max(np.abs(r), axis=1, keepdims=True) / \
                (2 ** wbits - 1) * 2 + 1e-8
            flipped = np.abs(o - r) > 1.5 * step
            if flipped.mean() > 0.01:
                problems.append(
                    f"quant[{rname}]: {flipped.mean():.1%} entries differ "
                    f"by >1.5 quant steps")
    return {"problems": problems, "ref_ppl_q": ref_ppl_q,
            "our_ppl_q": our_ppl_q}


def run_stable_rank_differential(cfg, workdir: str, *,
                                 family: str = "llama",
                                 seqlen: int = 24) -> dict:
    """Stable-rank proxy oracle (ref sensitivity.py:64-110): both sides'
    sensitivity dicts on the same tiny model."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_stable_rank
    from asvd4llm_tpu.models import params_from_torch_model

    model = build_tiny_torch_model(family, cfg.seed, seqlen=seqlen)
    batches = synthetic_calib_batches(cfg.n_calib_samples, seqlen, 128,
                                      seed=cfg.seed)
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    ours = calib_sensitivity_stable_rank(params, spec, batches, cfg)

    ref = load_reference()
    args = make_args_namespace(cfg)
    loader = [{k: torch.from_numpy(v.copy()) for k, v in b.items()}
              for b in batches]
    model.config._name_or_path = f"tiny-{family}"
    prev_cwd = os.getcwd()
    os.makedirs(os.path.join(workdir, "cache"), exist_ok=True)
    os.chdir(workdir)
    try:
        with torch.no_grad():
            ref_dict = ref.sens.calib_sensitivity_stable_rank(
                model, loader, args, use_cache=False)
    finally:
        os.chdir(prev_cwd)
    # ratio keys come from different float expressions (ref's literal 0.3
    # vs our 0.1*3) — compare on rounded keys
    ref_dict = {k: {round(float(r), 6): float(v) for r, v in d.items()}
                for k, d in ref_dict.items()}
    ours_r = {k: {round(float(r), 6): float(v) for r, v in d.items()}
              for k, d in ours.items()}

    problems = []
    if set(ref_dict) != set(ours_r):
        problems.append(f"stable-rank keys differ: only-ref="
                        f"{sorted(set(ref_dict) - set(ours_r))} only-ours="
                        f"{sorted(set(ours_r) - set(ref_dict))}")
    else:
        for k, d in ref_dict.items():
            for r, v in d.items():
                ov = ours_r[k].get(r)
                if ov is None or abs(ov - v) > 1e-4 * abs(v) + 1e-6:
                    problems.append(f"stable_rank[{k}][{r}]: ref {v} "
                                    f"vs ours {ov}")
    return {"problems": problems, "ref": ref_dict, "ours": ours}


def main(argv=None):
    """CLI: python -m asvd4llm_tpu.tools.differential [--family llama]"""
    import argparse
    import json
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--family", default="llama", choices=["llama", "opt"])
    p.add_argument("--param_ratio_target", type=float, default=0.85)
    p.add_argument("--ppl_target", type=float, default=-1.0)
    p.add_argument("--compress_kv_cache", action="store_true")
    p.add_argument("--kv_cache_ratio_target", type=float, default=-1.0)
    p.add_argument("--act_aware", action="store_true", default=True)
    p.add_argument("--no-act_aware", dest="act_aware", action="store_false")
    p.add_argument("--scaling_method", default="abs_mean")
    p.add_argument("--sigma_fuse", default="UV")
    p.add_argument("--rank_align", type=int, default=1)
    p.add_argument("--n_calib_samples", type=int, default=4)
    p.add_argument("--seed", type=int, default=233)
    # model geometry (--preset production = the VERDICT r2 #3 point:
    # production shape + the quantize.sh rank_align=128 setting)
    p.add_argument("--preset", choices=["toy", "production"], default="toy")
    p.add_argument("--hidden", type=int, default=0)
    p.add_argument("--layers", type=int, default=0)
    p.add_argument("--heads", type=int, default=0)
    p.add_argument("--kv_heads", type=int, default=0)
    p.add_argument("--vocab", type=int, default=0)
    p.add_argument("--seqlen", type=int, default=0)
    p.add_argument("--inter", type=int, default=0)
    p.add_argument("--out", default="")
    ns = p.parse_args(argv)

    shapes = dict(hidden=32, layers=2, heads=2, kv_heads=2, vocab=128,
                  seqlen=24, inter=0)
    if ns.preset == "production":
        shapes = dict(hidden=768, layers=12, heads=12, kv_heads=12,
                      vocab=4096, seqlen=256, inter=3072)
        if ns.rank_align == 1:
            ns.rank_align = 128
    for k in shapes:
        v = getattr(ns, k)
        if v:
            shapes[k] = v

    from asvd4llm_tpu.config import ASVDConfig
    cfg = ASVDConfig(
        model_id="tiny-differential", calib_dataset="synthetic",
        param_ratio_target=ns.param_ratio_target, ppl_target=ns.ppl_target,
        compress_kv_cache=ns.compress_kv_cache,
        kv_cache_ratio_target=ns.kv_cache_ratio_target,
        act_aware=ns.act_aware, scaling_method=ns.scaling_method,
        sigma_fuse=ns.sigma_fuse, rank_align=ns.rank_align,
        n_calib_samples=ns.n_calib_samples, seed=ns.seed,
        svd_backend="exact", sensitivity_batch_ratios=True,
        fisher_double_shift=True, use_cache=False, eval_dtype="float32")

    import time
    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        out = run_differential(cfg, td, family=ns.family, **shapes)
    report = {"family": ns.family, "preset": ns.preset, "shapes": shapes,
              "rank_align": ns.rank_align,
              "parity": not out["problems"], "problems": out["problems"],
              "boundary_note": out.get("boundary_note"),
              "ref_ppl": out["ref"]["ppl"], "our_ppl": out["ours"]["ppl"],
              "manifest_ranks": sorted(set(out["ref"]["manifest"].values())),
              "n_compressed": len(out["ref"]["manifest"]),
              "wall_s": round(time.time() - t0, 1)}
    if out["problems"]:
        # full-precision inputs so a failed run is diagnosable offline
        # (the sum()-vs-+= knife edge was root-caused from scan prints;
        # make that forensic data part of the artifact)
        report["diagnostics"] = {
            "ref_sensitivity": {k: {repr(r): float(v) for r, v in d.items()}
                                for k, d in out["ref"]["sensitivity"].items()},
            "our_sensitivity": {k: {repr(r): float(v) for r, v in d.items()}
                                for k, d in out["ours"]["sensitivity"].items()},
            "ref_manifest": out["ref"]["manifest"],
            "our_manifest": out["ours"]["manifest"],
        }
    print(json.dumps(report, indent=2))
    if ns.out:
        with open(ns.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["parity"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
