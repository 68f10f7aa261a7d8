"""Experiment sweep runner — the host-side replacement for the reference's
shell fan-out (ref experiments/kv_cache.sh, quantize.sh, calibset.sh,
kv_cache_longbench.sh, gemma.sh; SURVEY §2.3).

The reference parallelizes sweep points as one-GPU-per-process shell jobs;
on a TPU host a sweep runs points sequentially on the chip (or across
hosts via any external scheduler), sharing all phase-artifact caches —
the sensitivity cache makes every point after the first cheap.

Presets mirror the reference's experiment grids.
"""

from __future__ import annotations

import json
import logging
import sys

from asvd4llm_tpu.config import ASVDConfig

log = logging.getLogger(__name__)


def kv_cache_sweep(model_id: str, ratios=None) -> list[ASVDConfig]:
    """ref experiments/kv_cache.sh:7-24: kv ratios 0.9 -> 0.2."""
    ratios = ratios or [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2]
    return [ASVDConfig(model_id=model_id, compress_kv_cache=True,
                       kv_cache_ratio_target=r, act_aware=True, alpha=0.5,
                       use_cache=True) for r in ratios]


def quantize_sweep(model_id: str) -> list[ASVDConfig]:
    """ref experiments/quantize.sh: awq int4/int8 x param ratios,
    rank_align 128."""
    cfgs = []
    for quant in ("awq_int8", "awq_int4"):
        for ratio in (1.0, 0.95, 0.9, 0.85, 0.8, 0.76):
            cfgs.append(ASVDConfig(model_id=model_id,
                                   param_ratio_target=ratio,
                                   act_aware=True, alpha=0.5,
                                   weight_quant=quant, rank_align=128,
                                   use_cache=True))
    return cfgs


def kv_cache_longbench_sweep(model_id: str, ratios=None) -> list[ASVDConfig]:
    """ref experiments/kv_cache_longbench.sh: KV sweeps evaluated on the
    small LongBench subset."""
    ratios = ratios or [0.8, 0.6, 0.4, 0.2]
    return [ASVDConfig(model_id=model_id, compress_kv_cache=True,
                       kv_cache_ratio_target=r, act_aware=True, alpha=0.5,
                       eval_ppl="", eval_tasks="small_longbench",
                       use_cache=True) for r in ratios]


def calibset_sweep(model_id: str) -> list[ASVDConfig]:
    """ref experiments/calibset.sh: calibration-set ablation."""
    return [ASVDConfig(model_id=model_id, calib_dataset=ds,
                       param_ratio_target=0.9, act_aware=True, alpha=0.5,
                       seed=42, use_cache=True)
            for ds in ("wikitext2", "c4", "selfgen")]


def param_ratio_sweep(model_id: str, ratios=(0.95, 0.9, 0.85)
                      ) -> list[ASVDConfig]:
    """ref README.md:26-33 published operating points."""
    return [ASVDConfig(model_id=model_id, param_ratio_target=r,
                       act_aware=True, alpha=0.5, use_cache=True)
            for r in ratios]


PRESETS = {
    "kv_cache": kv_cache_sweep,
    "kv_cache_longbench": kv_cache_longbench_sweep,
    "quantize": quantize_sweep,
    "calibset": calibset_sweep,
    "param_ratio": param_ratio_sweep,
}


def run_sweep(configs: list[ASVDConfig], *, dry_run: bool = False,
              allow_synthetic_fallback: bool = True) -> list[dict]:
    from asvd4llm_tpu.pipeline import run

    results = []
    for i, cfg in enumerate(configs):
        log.info("=== sweep point %d/%d: %s ===", i + 1, len(configs),
                 {k: v for k, v in cfg.to_dict().items()
                  if v != ASVDConfig(model_id=cfg.model_id).to_dict().get(k)})
        if dry_run:
            results.append({"config": cfg.to_dict(), "dry_run": True})
            continue
        try:
            results.append({"config": cfg.to_dict(),
                            "results": run(cfg, allow_synthetic_fallback=
                                           allow_synthetic_fallback)})
        except Exception as e:  # keep the sweep alive, record the failure
            log.exception("sweep point failed")
            results.append({"config": cfg.to_dict(), "error": str(e)})
    return results


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("usage: python -m asvd4llm_tpu.tools.sweep <preset> <model_id> "
              "[--dry_run]", file=sys.stderr)
        return 2
    preset, model_id = argv[0], argv[1]
    configs = PRESETS[preset](model_id)
    results = run_sweep(configs, dry_run="--dry_run" in argv)
    print(json.dumps(results if "--dry_run" in argv else
                     [r.get("results", r.get("error")) for r in results],
                     default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
