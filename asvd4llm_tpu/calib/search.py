"""Binary-search rank allocation (ref binary_search.py:10-131).

Algorithm parity, step by step:
- flatten the sensitivity dict to (layer, ratio, ppl) triples, dropping
  ratio >= 1 entries in weight mode (ref :42-48);
- sort by ppl DESCENDING (ref :49);
- binary-search a cut index `mid`: the trial config assigns each layer the
  MINIMUM ratio among its entries in sorted_list[mid:], default ratio 1
  (weights) or 2 (KV mode; a rank-r factor pair holds 2r·d params so the
  rank ratio is param_ratio/2, ref :29-36,94-96);
- feasibility: param-ratio mode compares the arithmetic total ratio
  (KV mode: /2) against the target (ref :88-102); ppl-target mode
  decomposes all selected layers and evaluates calibration PPL
  (ref :64-87);
- final pass decomposes every layer whose assigned ratio != default
  (ref :104-131), here into true two-factor low-rank leaves.

The search itself is cheap host bookkeeping; all device work goes through
the jitted factorizer and the jitted PPL evaluator. In ppl-target mode the
trial decompositions use the same recomposition trick as the sensitivity
scan so the evaluator never recompiles.

Returns (new_params, manifest) where manifest = {layer_name: rank} — the
moral equivalent of the reference's ``truncation_ranks`` config entry
(ref build_asvd_repo.py:65-69).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.eval.ppl import evaluate_perplexity
from asvd4llm_tpu.models.registry import (
    get_linear, iter_linears, leaf_shape, lowrank_leaf, set_linear,
)
from asvd4llm_tpu.ops.asvd import (
    build_scaling_vector, rank_for_param_ratio,
)

log = logging.getLogger(__name__)


def naive_compressed_params(numels: dict, ratios: dict) -> tuple:
    """(compressed, total) params via naive `+=` float accumulation in
    dict order — NOT builtin sum(): since Python 3.12 sum() is
    Neumaier-compensated, which is MORE accurate than the reference's
    `compress_params += numel * ratio` loop (ref binary_search.py:90-93).
    At a knife-edge where the achievable ratio equals the target exactly,
    the last ulp decides the branch (measured in the production
    differential: naive 98933145.60000001 vs compensated 98933145.6 ->
    `0.8500000000000001 > 0.85` flips, shifting the manifest by one
    layer). Bit-replicate the reference's arithmetic, including its
    iteration order (see reference_walk_order)."""
    tot = 0
    comp = 0
    for n, r in ratios.items():
        tot += numels[n]
        comp += numels[n] * r
    return comp, tot


def binary_search_truncation_rank(params, spec, sensitivity_dict,
                                  calib_loader, cfg, *, stats=None,
                                  fisher=None, resume_dir=None,
                                  max_rss_gb=None):
    """Returns (compressed_params, manifest {name: rank}).

    resume_dir/max_rss_gb: per-leaf factor checkpointing for the final
    decompose pass (the search loop itself is host-only arithmetic in
    ratio-target mode). Long on-chip runs leak host RSS per device buffer
    through the TPU tunnel (utils/hostguard.py); each decomposed leaf's
    factors are persisted to resume_dir and the pass raises
    HostBudgetExceeded at the budget so a relaunch reloads finished
    leaves from disk instead of re-running their SVDs. Deterministic
    across restarts: ratio-mode search is pure host arithmetic over the
    (cached) sensitivity dict, and the per-leaf RNG stream is split
    whether a leaf is loaded or recomputed."""
    if cfg.compress_kv_cache:
        ratio_target = cfg.kv_cache_ratio_target
        sensitivity_dict = {k: v for k, v in sensitivity_dict.items()
                            if "k_proj" in k or "v_proj" in k}
        assert cfg.ppl_target < 0, \
            "ppl_target is not supported when compressing kv_cache"
        default_param_ratio = 2
    else:
        ratio_target = cfg.param_ratio_target
        default_param_ratio = 1

    log.info("=== %s target: ppl=%s, ratio_target=%s ===",
             "compress kv_cache" if cfg.compress_kv_cache else "compress weight",
             cfg.ppl_target, ratio_target)

    # Re-key the dict into the reference's module-walk order: the stable
    # sort's tie-break (exact PPL ties are COMMON under rank_align, where
    # several grid ratios alias to one rank) and the naive compressed-params
    # accumulation below both depend on dict order.
    from asvd4llm_tpu.models.registry import reference_walk_order
    sensitivity_dict = {
        name: sensitivity_dict[name]
        for name in reference_walk_order(params, spec,
                                         list(sensitivity_dict))}

    sensitivity_list = []
    for layername, v in sensitivity_dict.items():
        for param_ratio, ppl in v.items():
            if not cfg.compress_kv_cache and param_ratio >= 1:
                continue  # ref :45-47
            sensitivity_list.append((layername, param_ratio, ppl))
    sorted_list = sorted(sensitivity_list, key=lambda x: -x[2])

    assert cfg.ppl_target > 0 or ratio_target > 0, (
        "set one of --ppl_target / --param_ratio_target / "
        "--kv_cache_ratio_target (ref binary_search.py:54)")

    # shapes for exactly the layers the sensitivity scan covered (which may
    # include lm_head / project_in/out when compress_all_linears)
    shapes = {name: leaf_shape(get_linear(params, spec, name))
              for name in sensitivity_dict}
    numels = {name: s[0] * s[1] for name, s in shapes.items()}
    input_ids = None
    svd_cache: dict = {}
    if cfg.ppl_target > 0:
        input_ids = np.concatenate(
            [np.asarray(b["input_ids"]) for b in calib_loader], axis=0)

    def config_at(mid):
        ratios = {name: default_param_ratio for name in sensitivity_dict}
        for layername, r, _ in sorted_list[mid:]:
            ratios[layername] = min(ratios[layername], r)
        return ratios

    def _layer_svd(name, sub):
        """Per-layer max-rank SVD, computed once and truncated per trial —
        the sensitivity scan's one-SVD-per-layer trick reused inside the
        ppl-target loop (instead of one fresh SVD per layer per search
        iteration)."""
        ent = svd_cache.get(name)
        if ent is not None:
            return ent
        from asvd4llm_tpu.ops.svd import truncated_svd
        leaf = get_linear(params, spec, name)
        out_f, in_f = leaf_shape(leaf)
        # trials (and the final pass) may request ANY grid ratio plus the
        # default ratio. KV mode's grid runs past 1.0 (to 1.9, ref
        # sensitivity.py:36-37: params GROW but the rank-dim cache still
        # shrinks) — dropping >=1 ratios here silently truncated a chosen
        # ratio-1.4 layer to the ratio-1.0 rank (384 vs the reference's
        # 640 at 768x768/rank_align 128; caught by the production-shape
        # KV differential, benchmarks/results/differential_production_kv_r3.json)
        cand = list(sensitivity_dict[name]) + [1.0, default_param_ratio]
        max_rank = max(min(rank_for_param_ratio(in_f, out_f, r,
                                                cfg.rank_align), in_f, out_f)
                       for r in cand)
        scale = None
        if cfg.act_aware:
            scale = build_scaling_vector(
                None if stats is None else stats.get(name),
                None if fisher is None else fisher.get(name), cfg.alpha)
        # host-master residency: leaf["w"] may be a host numpy master
        # (models/hostmem.py) — one explicit upload per name, used once
        w32 = jnp.asarray(leaf["w"]).astype(jnp.float32)
        if scale is not None:
            w32 = w32 * scale[None, :]
        u, s, vh = truncated_svd(w32, max(max_rank, 1),
                                 backend=cfg.svd_backend, key=sub)
        if scale is not None:
            vh = vh / scale[None, :]
        ent = (u, s, vh, leaf)
        svd_cache[name] = ent
        return ent

    def _trial_dense(name, r, sub):
        """Rank-r dense recomposition from the cached factorization
        (numerically identical to a fresh rank-r ASVD: truncating the
        max-rank SVD at r IS the rank-r solution)."""
        leaf0 = get_linear(params, spec, name)
        out_f, in_f = leaf_shape(leaf0)
        rank = rank_for_param_ratio(in_f, out_f, r, cfg.rank_align)
        if rank <= 0:
            return None
        rank = min(rank, in_f, out_f)
        u, s, vh, leaf = _layer_svd(name, sub)
        w_hat = ((u[:, :rank] * s[:rank][None, :]) @ vh[:rank, :]
                 ).astype(leaf["w"].dtype)
        if not bool(jnp.isfinite(w_hat).all()):
            return None
        from asvd4llm_tpu.models.registry import dense_leaf
        return dense_leaf(w_hat, leaf["b"])

    low, high = 0, len(sorted_list) - 1
    mid = (low + high) // 2
    key = jax.random.PRNGKey(cfg.seed)
    while low < high:
        mid = (low + high) // 2
        ratios = config_at(mid)
        comp, tot = naive_compressed_params(numels, ratios)
        if cfg.ppl_target > 0:
            trial = params
            # NOTE: like the reference (binary_search.py:66-79), the trial
            # factorizes EVERY layer — including ratio-1.0 ones, where
            # rank = numel/(in+out) is a lossy near-half-rank truncation.
            # Only the final pass skips default-ratio layers (ref :116-117).
            for name, r in ratios.items():
                key, sub = jax.random.split(key)
                new_leaf = _trial_dense(name, r, sub)
                if new_leaf is not None:
                    trial = set_linear(trial, spec, name, new_leaf)
            ppl = evaluate_perplexity(trial, spec, input_ids,
                                      cfg.n_calib_samples)
            log.info("low=%d mid=%d high=%d ppl=%.4f param_ratio=%.4f",
                     low, mid, high, ppl, comp / tot)
            if ppl < cfg.ppl_target:
                high = mid
            else:
                low = mid + 1
        else:
            now_ratio = comp / tot
            if cfg.compress_kv_cache:
                now_ratio /= 2  # ref :94-96
            log.info("low=%d mid=%d high=%d now_ratio=%.4f params=(%d/%d)",
                     low, mid, high, now_ratio, comp, tot)
            if now_ratio > ratio_target:
                high = mid
            else:
                low = mid + 1

    def _factors_from_cache(name, r, sub):
        """Final-pass factors by TRUNCATING the cached per-layer max-rank
        SVD (one compiled SVD program per shape bucket, instead of a fresh
        compile per distinct (shape, rank) — each of which costs a
        multi-minute XLA compile through the TPU tunnel; measured: the
        per-leaf path spent 606 s on a 2-layer 7B-dims model, ~40 s/leaf,
        all compiles). Truncating the max-rank SVD at rank r IS the rank-r
        solution, and it is the same factorization the ppl-target trials
        evaluated, so the shipped model matches what the search measured."""
        from asvd4llm_tpu.ops.asvd import LowRankFactors

        leaf0 = get_linear(params, spec, name)
        out_f, in_f = leaf_shape(leaf0)
        rank = min(rank_for_param_ratio(in_f, out_f, r, cfg.rank_align),
                   in_f, out_f)
        if rank <= 0:
            return None
        u, s, vh, leaf = _layer_svd(name, sub)
        u_r, s_r, vh_r = u[:, :rank], s[:rank], vh[:rank, :]
        if cfg.sigma_fuse == "UV":
            sq = jnp.sqrt(s_r)
            a, b_f = u_r * sq[None, :], sq[:, None] * vh_r
        elif cfg.sigma_fuse == "U":
            a, b_f = u_r * s_r[None, :], vh_r
        else:  # "V"
            a, b_f = u_r, s_r[:, None] * vh_r
        a = a.astype(leaf["w"].dtype)
        b_f = b_f.astype(leaf["w"].dtype)
        if not (bool(jnp.isfinite(a).all()) and bool(jnp.isfinite(b_f).all())):
            return None
        return LowRankFactors(a, b_f, leaf["b"])

    # final decomposition at the last computed mid (ref :104-131 reuses
    # `mid` from the loop, parity quirk kept). Per-leaf SVDs are serial on
    # purpose: the jitted exact SVD is ~0.9 s/leaf warm, while the vmapped
    # batched form measured 3x SLOWER per matrix on chip (XLA's batched
    # Jacobi SVD does not parallelize across the batch).
    log.info("=== Searching done, decomposing layers... ===")
    ratios = config_at(mid)
    t0 = time.time()
    manifest: dict = {}
    out = params
    if resume_dir is not None:
        import os
        os.makedirs(resume_dir, exist_ok=True)
    n_loaded = 0
    for name, r in ratios.items():
        if r == default_param_ratio:
            continue
        key, sub = jax.random.split(key)
        if resume_dir is not None:
            import os
            ck = os.path.join(resume_dir, name + ".npz")
            if os.path.exists(ck):
                try:
                    z = np.load(ck)
                    f_a = jnp.asarray(z["a"])
                    f_b = jnp.asarray(z["b"])
                    bias = jnp.asarray(z["bias"]) if "bias" in z.files \
                        else None
                    out = set_linear(out, spec, name,
                                     lowrank_leaf(f_a, f_b, bias))
                    manifest[name] = int(z["rank"])
                    n_loaded += 1
                    continue
                except Exception as e:  # torn file from a kill: recompute
                    log.warning("decompose resume: unreadable %s (%s) — "
                                "recomputing", ck, e)
        f = _factors_from_cache(name, r, sub)
        # the final pass is the last consumer of this name's max-rank SVD;
        # evicting bounds peak HBM to ONE cached factorization instead of
        # every compressed layer's (u, s, vh) — ~23 GB at full 7B depth
        svd_cache.pop(name, None)
        if f is None:
            log.warning("factorization unusable for %s at ratio %s; "
                        "keeping dense layer", name, r)
            continue
        out = set_linear(out, spec, name, lowrank_leaf(f.A, f.B, f.bias))
        manifest[name] = f.rank
        if resume_dir is not None:
            import os
            ck = os.path.join(resume_dir, name + ".npz")
            arrs = {"a": np.asarray(f.A), "b": np.asarray(f.B),
                    "rank": np.int64(f.rank)}
            if f.bias is not None:
                arrs["bias"] = np.asarray(f.bias)
            tmp = ck + ".tmp.npz"  # np.savez appends .npz to bare names
            np.savez(tmp, **arrs)
            os.replace(tmp, ck)  # atomic: a kill never leaves a torn .npz
            if max_rss_gb is not None:
                from asvd4llm_tpu.utils.hostguard import check
                check(max_rss_gb, f"decompose {name}")
        o, i = shapes[name]
        if cfg.compress_kv_cache and f.rank >= min(o, i):
            log.warning("%s: rank_align=%d rounded rank to the full "
                        "dimension (%d) — no realized KV compression for "
                        "this layer", name, cfg.rank_align, f.rank)
        # sanity parity check against the reference rank formula; warn, don't
        # crash a long production run on a backend clamp
        expect = min(rank_for_param_ratio(i, o, r, cfg.rank_align), i, o)
        if f.rank != expect:
            log.warning("%s: realized rank %d != reference formula %d "
                        "(ratio %s) — manifest deviates from reference "
                        "accounting", name, f.rank, expect, r)
    log.info("decompose time: %.2fs (%d layers, %d from resume checkpoints)",
             time.time() - t0, len(manifest), n_loaded)
    return out, manifest
