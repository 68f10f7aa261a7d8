"""Convert reference-format .pt cache artifacts into this framework's
cache formats.

The reference publishes its sensitivity caches on the HF hub as torch .pt
files (ref README.md:110-114) and stores calibration stats the same way
(ref act_aware_utils.py:44,95; sensitivity.py:60). This converter makes
those published artifacts usable here:

- sensitivity dicts {layer_name: {ratio: ppl}}  -> cache/sensitivity_<key>.json
- stats dicts {layer_name: tensor[in_features]} -> cache/calib_<mode>_<key>.npz
- fisher dicts                                   -> cache/fisher_<key>.npz

Usage:
  python -m asvd4llm_tpu.tools.convert_cache sensitivity in.pt cache_dir key
  python -m asvd4llm_tpu.tools.convert_cache stats in.pt cache_dir key [abs_mean|abs_max]
  python -m asvd4llm_tpu.tools.convert_cache fisher in.pt cache_dir key
"""

from __future__ import annotations

import sys

import numpy as np

from asvd4llm_tpu.utils.cache import ArtifactCache


def _load_pt(path: str) -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a dict, got {type(obj)}")
    return obj


def convert_sensitivity(path: str, cache_dir: str, key: str) -> str:
    obj = _load_pt(path)
    sens = {str(name): {float(r): float(p) for r, p in d.items()}
            for name, d in obj.items()}
    return ArtifactCache(cache_dir).save_json("sensitivity", key, sens)


def convert_stats(path: str, cache_dir: str, key: str,
                  mode: str = "abs_mean") -> str:
    obj = _load_pt(path)
    arrays = {str(k): np.asarray(v.float().numpy() if hasattr(v, "float")
                                 else v, np.float32)
              for k, v in obj.items()}
    return ArtifactCache(cache_dir).save_arrays(f"calib_{mode}", key, arrays)


def convert_fisher(path: str, cache_dir: str, key: str) -> str:
    obj = _load_pt(path)
    arrays = {str(k): np.asarray(v.float().numpy() if hasattr(v, "float")
                                 else v, np.float32)
              for k, v in obj.items()}
    return ArtifactCache(cache_dir).save_arrays("fisher", key, arrays)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    kind, path, cache_dir, key = argv[:4]
    if kind == "sensitivity":
        out = convert_sensitivity(path, cache_dir, key)
    elif kind == "stats":
        out = convert_stats(path, cache_dir, key,
                            argv[4] if len(argv) > 4 else "abs_mean")
    elif kind == "fisher":
        out = convert_fisher(path, cache_dir, key)
    else:
        print(f"unknown kind {kind!r}", file=sys.stderr)
        return 2
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
