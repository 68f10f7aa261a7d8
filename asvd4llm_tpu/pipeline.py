"""End-to-end compression pipeline (ref asvd.py:14-78).

Sequence parity: load -> calib data -> [fisher] -> [abs stats] ->
sensitivity -> binary search -> [quantize] -> evaluate -> append results.
Everything below the orchestration is jitted device work; this file is
host-side glue and stays boring on purpose.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import numpy as np

from asvd4llm_tpu.calib.fisher import calib_fisher_info
from asvd4llm_tpu.calib.search import binary_search_truncation_rank
from asvd4llm_tpu.calib.sensitivity import (
    calib_sensitivity_ppl, calib_sensitivity_stable_rank,
)
from asvd4llm_tpu.calib.stats import calib_input_distribution
from asvd4llm_tpu.config import ASVDConfig
from asvd4llm_tpu.data.datasets import get_calib_data, get_eval_tokens
from asvd4llm_tpu.eval.ppl import evaluate_ppl_windowed
from asvd4llm_tpu.utils.cache import ArtifactCache

log = logging.getLogger(__name__)


def compress(params, spec, tokenizer, cfg: ASVDConfig, *,
             vocab_size=None, allow_synthetic_fallback=False):
    """Run calibration + sensitivity + search; returns
    (compressed_params, manifest, artifacts dict)."""
    from asvd4llm_tpu.utils.profiling import phase

    # multi-chip: place params on the (dp, tp) mesh — or the 3-axis
    # (dcn, dp, tp) multi-slice mesh when mesh_shape has three entries
    # (batch axes span (dcn, dp); weights never cross DCN) — every jitted
    # pass below then runs SPMD via GSPMD-inserted collectives
    mesh = None
    if int(np.prod(cfg.mesh_shape)) > 1:
        from asvd4llm_tpu.parallel.mesh import (
            make_mesh, make_multislice_mesh, shard_params,
        )
        shape = tuple(cfg.mesh_shape)
        mesh = (make_multislice_mesh(*shape) if len(shape) == 3
                else make_mesh(shape))
        params = shard_params(params, spec, mesh)
        log.info("params sharded over mesh %s", dict(mesh.shape))

    cache = ArtifactCache(cfg.cache_dir, enabled=cfg.use_cache)
    with phase("calib_data"):
        if cfg.calib_dataset == "selfgen":
            from asvd4llm_tpu.tools.selfgen import gen_calib_set
            calib_loader = gen_calib_set(
                params, spec, tokenizer, cfg.model_id,
                nsamples=cfg.n_calib_samples, seqlen=cfg.seqlen,
                seed=cfg.seed, cache_dir=cfg.cache_dir,
                use_cache=cfg.use_cache)
        else:
            calib_loader = get_calib_data(
                cfg.calib_dataset, tokenizer, cfg.model_id,
                cfg.n_calib_samples, seqlen=cfg.seqlen, seed=cfg.seed,
                use_bos=cfg.use_bos, cache_dir=cfg.cache_dir,
                use_cache=cfg.use_cache,
                vocab_size=vocab_size or spec.vocab_size,
                allow_synthetic_fallback=allow_synthetic_fallback,
                fixed_alpaca_template=cfg.fixed_alpaca_template)

    # single-chip models too large to duplicate in HBM (7B on a 16 GB
    # v5e): per-layer masters move to host; the device holds ONE working
    # representation per phase — the stacked scan arrays through the
    # calib/scan phases, then the growing compressed model
    # (models/hostmem.py). Runs after calib-data generation (selfgen
    # decodes with the device-resident model). Fisher mode composes: the
    # backward streams one layer at a time (calib/fisher.py streamed path).
    from asvd4llm_tpu.models import hostmem
    from asvd4llm_tpu.models.scan_forward import can_scan, stack_layers
    stacked = None
    if ((hostmem.is_host_layers(params) or hostmem.should_offload(
            params, mesh)) and can_scan(params, spec)
            and cfg.sensitivity_metric == "ppl"):
        if not hostmem.is_host_layers(params):
            params = hostmem.offload_layers(params)
        with phase("stack_layers"):
            stacked = stack_layers(params, spec)

    fisher = None
    stats = None
    if "fisher" in cfg.scaling_method:
        with phase("calib_fisher"):
            fisher = calib_fisher_info(
                params, spec, calib_loader, cache=cache,
                cache_key=cfg.calib_key(),
                include_extras=cfg.compress_all_linears,
                double_shift=cfg.fisher_double_shift)
    if "abs" in cfg.scaling_method:
        with phase("calib_stats"):
            stats = calib_input_distribution(params, spec, calib_loader,
                                             cfg.scaling_method, cache=cache,
                                             cache_key=cfg.calib_key(),
                                             stacked=stacked)

    # host-RSS recycling knobs (utils/hostguard.py): opt-in for long
    # single-chip runs through the leaky tunnel
    _resume = cfg.scan_resume_path or None
    _max_rss = cfg.max_host_rss_gb if cfg.max_host_rss_gb > 0 else None
    with phase("sensitivity"):
        if cfg.sensitivity_metric == "ppl":
            sensitivity = calib_sensitivity_ppl(params, spec, calib_loader,
                                                cfg, stats=stats,
                                                fisher=fisher, cache=cache,
                                                mesh=mesh, stacked=stacked,
                                                free_stacked=stacked
                                                is not None,
                                                resume=_resume,
                                                max_rss_gb=_max_rss)
        else:
            sensitivity = calib_sensitivity_stable_rank(params, spec,
                                                        calib_loader, cfg,
                                                        cache=cache)

    # the stacked scan arrays are the search/decompose phases' HBM budget
    del stacked

    with phase("binary_search"):
        compressed, manifest = binary_search_truncation_rank(
            params, spec, sensitivity, calib_loader, cfg,
            stats=stats, fisher=fisher,
            resume_dir=(_resume + ".factors") if _resume else None,
            max_rss_gb=_max_rss)

    if hostmem.is_host_layers(compressed):
        # dense-kept layers re-upload ONCE; the eval phase must not pay a
        # host transfer per jit call
        with phase("device_put_compressed"):
            compressed = hostmem.device_put_dense_leaves(compressed)

    if cfg.weight_quant != "none":
        from asvd4llm_tpu.ops.quant_apply import quantize_model_weights
        with phase("weight_quant"):
            compressed = quantize_model_weights(compressed, spec,
                                                cfg.weight_quant, stats=stats)

    if cfg.deploy_int8_factors:
        from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int8
        with phase("deploy_int8"):
            compressed = quantize_lowrank_factors_int8(compressed, spec)

    if cfg.deploy_int4_factors:
        from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int4
        with phase("deploy_int4"):
            compressed = quantize_lowrank_factors_int4(
                compressed, spec, group=cfg.int4_group_size, stats=stats)

    artifacts = {"stats": stats, "fisher": fisher, "sensitivity": sensitivity,
                 "calib_loader": calib_loader}
    return compressed, manifest, artifacts


def evaluate(params, spec, tokenizer, cfg: ASVDConfig, *,
             allow_synthetic_fallback=False) -> dict:
    """PPL on cfg.eval_ppl datasets (+ tasks via eval/harness)."""
    results: dict = {}
    if cfg.eval_ppl:
        for ds in cfg.eval_ppl.split(","):
            toks = get_eval_tokens(ds, tokenizer, cache_dir=cfg.cache_dir,
                                   use_cache=cfg.use_cache,
                                   vocab_size=spec.vocab_size,
                                   allow_synthetic_fallback=allow_synthetic_fallback,
                                   model_id=cfg.model_id)
            bos_id = getattr(tokenizer, "bos_token_id", 0) or 0
            ppl = evaluate_ppl_windowed(params, spec, toks, seqlen=cfg.seqlen,
                                        use_bos=cfg.use_bos,
                                        bos_token_id=bos_id)
            log.info("%s ppl: %.4f", ds, ppl)
            results[ds] = ppl
    tasks = "mmlu" if cfg.eval_mmlu else cfg.eval_tasks
    if tasks:
        from asvd4llm_tpu.eval.harness import evaluate_tasks
        results.update(evaluate_tasks(params, spec, tokenizer, tasks, cfg))
    return results


def write_results(cfg: ASVDConfig, results: dict, manifest=None):
    """Append to output/result.txt (reference format, ref asvd.py:71-75)
    plus a structured JSONL record."""
    os.makedirs(cfg.output_dir, exist_ok=True)
    with open(os.path.join(cfg.output_dir, "result.txt"), "a+") as f:
        f.write(f"{cfg.to_dict()}\n")
        f.write(f"{results}\n")
    with open(os.path.join(cfg.output_dir, "results.jsonl"), "a+") as f:
        rec = {"time": time.time(), "config": cfg.to_dict(),
               "results": results}
        if manifest is not None:
            rec["n_compressed_layers"] = len(manifest)
        f.write(json.dumps(rec) + "\n")


def _enable_compilation_cache(cache_dir: str):
    """Persistent XLA compilation cache — compiles through the TPU tunnel
    cost minutes, and the sensitivity scan compiles once per layer; the
    cache makes every later run (and every sweep point) reuse them."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_dir, "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax versions
        log.debug("compilation cache unavailable: %s", e)


def run(cfg: ASVDConfig, *, allow_synthetic_fallback=False) -> dict:
    """Full pipeline from a model id / local checkpoint path."""
    np.random.seed(cfg.seed)
    _enable_compilation_cache(cfg.cache_dir)
    from asvd4llm_tpu.models.loader import load_model
    params, spec, tokenizer = load_model(cfg.model_id, dtype=cfg.eval_dtype)

    manifest = None
    if not cfg.raw_model:
        params, manifest, _ = compress(
            params, spec, tokenizer, cfg,
            allow_synthetic_fallback=allow_synthetic_fallback)

    results = evaluate(params, spec, tokenizer, cfg,
                       allow_synthetic_fallback=allow_synthetic_fallback)
    log.info("results: %s", results)
    write_results(cfg, results, manifest)
    return results
