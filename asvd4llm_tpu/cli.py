"""CLI entry point: ``python -m asvd4llm_tpu.cli --model_id ... ``.

Flag surface mirrors ref asvd.py:81-201 via the ASVDConfig dataclass
(one source of truth for both drivers, unlike the reference's duplicated
argparse blocks).
"""

from __future__ import annotations

import logging
import sys


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit platform choice even under site hooks that
        # wrap jax's backend selection (the axon sitecustomize forces its
        # backend regardless of the env var — a JAX_PLATFORMS=cpu run
        # would otherwise silently device_put onto the TPU)
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from asvd4llm_tpu.config import config_from_args
    from asvd4llm_tpu.pipeline import run

    cfg = config_from_args(argv)
    results = run(cfg, allow_synthetic_fallback=True)
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
