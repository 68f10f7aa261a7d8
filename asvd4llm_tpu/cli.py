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
    from asvd4llm_tpu.config import config_from_args
    from asvd4llm_tpu.pipeline import run

    cfg = config_from_args(argv)
    results = run(cfg, allow_synthetic_fallback=True)
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
