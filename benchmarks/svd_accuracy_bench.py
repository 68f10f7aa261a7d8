"""SVD backend accuracy at the REAL model shapes (VERDICT r2 weak #8).

Two questions, answered with synthetic matrices of KNOWN spectrum (direct
full SVD of 32000x4096 is exactly what the Gram path exists to avoid — it
OOM-kills the XLA compile service — so the oracle is construction, not a
second decomposition):

1. Gram-path exact SVD at the 32000x4096 lm_head shape: build
   w = U diag(s) V^T from orthonormalized Gaussians (QR compiles fine at
   this shape; SVD does not) with a power-law spectrum, run
   ops/svd.py::_gram_truncated_svd, report singular-value recovery error
   and the recomposition error vs the OPTIMAL rank-r truncation
   (analytically sqrt(sum_{i>r} s_i^2) for a known spectrum).

2. Randomized vs exact truncated SVD on a DECAYING power-law spectrum at
   the 11008x4096 MLP shape (flat random spectra — the prior tests — are
   the easy case for subspace iteration; decaying spectra with small
   spectral gaps are the honest one).

Usage: python benchmarks/svd_accuracy_bench.py [--json out.json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.ops.svd import (  # noqa: E402
    _gram_truncated_svd, randomized_svd, truncated_svd,
)


def _known_spectrum_matrix(key, m, n, alpha):
    """w = U diag(s) V^T with orthonormal U [m, n], V [n, n] and
    s_i = i^-alpha (power law). Returns (w, s)."""
    ku, kv = jax.random.split(key)
    u, _ = jnp.linalg.qr(jax.random.normal(ku, (m, n), jnp.float32))
    v, _ = jnp.linalg.qr(jax.random.normal(kv, (n, n), jnp.float32))
    s = jnp.arange(1, n + 1, dtype=jnp.float32) ** jnp.float32(-alpha)
    w = (u * s[None, :]) @ v.T
    return w, s


@jax.jit
def _fro(x):
    return jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--head_m", type=int, default=32000)
    ap.add_argument("--head_n", type=int, default=4096)
    ap.add_argument("--mlp_m", type=int, default=11008)
    ap.add_argument("--mlp_n", type=int, default=4096)
    ns = ap.parse_args(argv)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "cache",
                              "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out = {"backend": jax.default_backend(), "runs": {}}
    alpha = 1.0

    # --- 1. Gram path at the lm_head shape -----------------------------
    m, n = ns.head_m, ns.head_n
    w, s_true = _known_spectrum_matrix(jax.random.PRNGKey(0), m, n, alpha)
    rank = int(0.5 * m * n / (m + n))    # the grid's ~0.5-ratio rank
    t0 = time.time()
    u, s, vh = jax.jit(_gram_truncated_svd,
                       static_argnums=(1,))(w, rank)
    jax.block_until_ready(s)
    dt = time.time() - t0
    sv_rel_err = float(jnp.max(jnp.abs(s - s_true[:rank]) / s_true[:rank]))
    resid = _fro(w - (u * s[None, :]) @ vh)
    optimal = float(jnp.sqrt(jnp.sum(s_true[rank:] ** 2)))
    out["runs"]["gram_head"] = {
        "shape": [m, n], "rank": rank, "seconds": round(dt, 2),
        "singular_value_max_rel_err": sv_rel_err,
        "recomposition_fro_err": float(resid),
        "optimal_rank_r_fro_err": optimal,
        "excess_over_optimal": float(resid) / max(optimal, 1e-30),
    }
    print(json.dumps({"gram_head": out["runs"]["gram_head"]}), flush=True)

    # --- 2. randomized vs exact on a decaying spectrum at MLP shape ----
    m, n = ns.mlp_m, ns.mlp_n
    w, s_true = _known_spectrum_matrix(jax.random.PRNGKey(1), m, n, alpha)
    for ratio in (0.1, 0.25, 0.45):
        rank = int(ratio * min(m, n))
        opt = float(jnp.sqrt(jnp.sum(s_true[rank:] ** 2)))
        row = {"rank": rank, "optimal_fro_err": opt}
        for name in ("exact", "randomized"):
            t0 = time.time()
            u, s, vh = truncated_svd(w, rank, backend=name,
                                     key=jax.random.PRNGKey(2))
            jax.block_until_ready(s)
            dt = time.time() - t0
            resid = float(_fro(w - (u * s[None, :]) @ vh))
            row[name] = {"seconds": round(dt, 2),
                         "fro_err": resid,
                         "excess_over_optimal": resid / max(opt, 1e-30)}
        row["randomized_vs_exact_err_ratio"] = (
            row["randomized"]["fro_err"] / max(row["exact"]["fro_err"],
                                               1e-30))
        out["runs"][f"mlp_decay_r{ratio}"] = row
        print(json.dumps({f"mlp_decay_r{ratio}": row}), flush=True)

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out["runs"]))


if __name__ == "__main__":
    main()
