"""Deployable-repo builder — the second CLI driver
(ref huggingface_repos/build_asvd_repo.py:18-108).

Runs the calibration + sensitivity + search pipeline and exports BOTH
deployment artifacts:
- an HF trust_remote_code repo (truncation_ranks + generated modeling
  class + safetensors), and
- the native Orbax + manifest checkpoint.

The reference hardcodes the canonical recipe and asserts it
(ref build_asvd_repo.py:29,48-56: n_calib 256, alpha 0.5, abs_mean,
wikitext2 calib, ppl metric); we warn instead of asserting so
experimentation stays possible, but the default config IS the canonical
recipe.

Usage: python -m asvd4llm_tpu.export.build_repo --model_id ... \
           --param_ratio_target 0.9 --repo_dir output/asvd-repo
"""

from __future__ import annotations

import logging
import sys

log = logging.getLogger(__name__)

CANONICAL = dict(alpha=0.5, scaling_method="abs_mean",
                 calib_dataset="wikitext2", sensitivity_metric="ppl",
                 n_calib_samples=256)


def build_repo(cfg, repo_dir: str, *, native_dir: str | None = None,
               allow_synthetic_fallback: bool = False):
    from asvd4llm_tpu.export.checkpoint import save_compressed
    from asvd4llm_tpu.export.hf_repo import export_hf_repo
    from asvd4llm_tpu.models.loader import load_model
    from asvd4llm_tpu.pipeline import compress

    for key, want in CANONICAL.items():
        got = getattr(cfg, key)
        if got != want:
            log.warning("non-canonical %s=%r (canonical recipe uses %r, "
                        "ref build_asvd_repo.py:48-56)", key, got, want)

    params, spec, tokenizer = load_model(cfg.model_id, dtype=cfg.eval_dtype)
    compressed, manifest, _ = compress(
        params, spec, tokenizer, cfg,
        allow_synthetic_fallback=allow_synthetic_fallback)

    # export in float32 for maximal loader compatibility
    export_hf_repo(repo_dir, compressed, spec, manifest, tokenizer=tokenizer)
    log.info("wrote HF repo: %s (%d factored layers)", repo_dir, len(manifest))
    if native_dir:
        save_compressed(native_dir, compressed, spec, manifest, cfg)
        log.info("wrote native checkpoint: %s", native_dir)
    return repo_dir, manifest


def main(argv=None):
    from asvd4llm_tpu.config import config_from_args

    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    repo_dir = "output/asvd_repo"
    native_dir = None
    if "--repo_dir" in argv:
        i = argv.index("--repo_dir")
        repo_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--native_dir" in argv:
        i = argv.index("--native_dir")
        native_dir = argv[i + 1]
        del argv[i:i + 2]
    cfg = config_from_args(argv)
    if cfg.n_calib_samples == 32:  # builder default (ref :29)
        cfg = cfg.replace(n_calib_samples=256)
    build_repo(cfg, repo_dir, native_dir=native_dir,
               allow_synthetic_fallback=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
