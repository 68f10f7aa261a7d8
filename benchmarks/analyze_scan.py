"""Post-hoc analysis of a canonical-run per-leaf resume jsonl (VERDICT r4
item 9: re-verify the auto SVD backend boundary from the canonical run's
own timings).

Within one layer, every leaf's grid evaluation costs the SAME device time
(the suffix forward is identical no matter which leaf is substituted), so
per-layer dt differences across leaf keys isolate the per-leaf
SVD + recompose cost — exactly the part the backend boundary controls.
MLP leaves (11008x4096) route through the memory-aware Gram fallback at
full-depth residency; if that fallback were mispriced, mlp dt would sit
visibly above attn dt at equal suffix length.

Usage: python benchmarks/analyze_scan.py benchmarks/results/canonical_r5_resume.jsonl [--json out.json]
"""
import argparse
import json
from collections import defaultdict

import numpy as np


def analyze(path: str) -> dict:
    per_layer = defaultdict(dict)
    extras = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if "ratios" not in r:
            continue  # device-OOM marker record (no dt/ratios)
        key = r["name"].split(".")[-1]
        if r.get("li", -1) < 0:
            extras[r["name"]] = r["dt"]
        else:
            per_layer[r["li"]][key] = r["dt"]

    attn_keys = ("q_proj", "k_proj", "v_proj", "o_proj")
    mlp_keys = ("gate_proj", "up_proj", "down_proj")
    rows, attn_excess = [], []
    for li in sorted(per_layer):
        d = per_layer[li]
        attn = [d[k] for k in attn_keys if k in d]
        mlp = [d[k] for k in mlp_keys if k in d]
        if attn and mlp:
            rows.append((li, float(np.mean(attn)), float(np.mean(mlp))))
            attn_excess.append(float(np.mean(mlp)) - float(np.mean(attn)))

    # suffix-cost fit over steady layers (exclude layer 0: compiles/loads)
    pts = [(li, dt) for li, dmap in per_layer.items() if li >= 1
           for dt in dmap.values()]
    fit = {}
    if pts:
        L = max(per_layer) + 1
        x = np.array([L - li for li, _ in pts], float)
        y = np.array([dt for _, dt in pts], float)
        A = np.stack([np.ones_like(x), x], axis=1)
        (c0, c1), *_ = np.linalg.lstsq(A, y, rcond=None)
        fit = {"c0_s": round(float(c0), 2), "c1_s_per_suffix_layer":
               round(float(c1), 3), "layers_seen": L}

    return {
        "leaves": sum(len(v) for v in per_layer.values()) + len(extras),
        "per_layer_attn_vs_mlp_mean_s": [
            {"layer": li, "attn_s": round(a, 1), "mlp_s": round(m, 1)}
            for li, a, m in rows],
        "mlp_minus_attn_mean_s": (round(float(np.mean(attn_excess)), 2)
                                  if attn_excess else None),
        "mlp_minus_attn_p90_s": (round(float(np.percentile(attn_excess, 90)),
                                       2) if attn_excess else None),
        "suffix_fit": fit,
        "extras_s": {k: round(v, 1) for k, v in extras.items()},
        "total_scan_work_s": round(
            sum(dt for v in per_layer.values() for dt in v.values())
            + sum(extras.values()), 1),
        "note": ("grid-eval cost is leaf-key-independent within a layer, "
                 "so mlp_minus_attn isolates the MLP leaves' extra "
                 "SVD+recompose cost — the share the auto backend boundary "
                 "(ops/svd.py gram fallback at 11008x4096) controls."),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--json", default=None)
    ns = ap.parse_args()
    out = analyze(ns.jsonl)
    print(json.dumps(out, indent=1))
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)
