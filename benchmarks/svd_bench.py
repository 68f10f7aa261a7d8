"""On-chip SVD benchmark at 7B weight scale (round-2 VERDICT item #2).

Times exact (jnp.linalg.svd -> truncate) vs randomized subspace iteration
(ops/svd.py) for Llama-2-7B weight shapes in float32, across the ranks the
pipeline actually requests (sensitivity scan max-rank at ratio 0.9,
deployment ranks at 0.85, KV-grade ranks), measures the randomized path's
recomposition-accuracy gap, and projects the full 7B sensitivity-scan
factorization wall time (the phase the reference reports as "several
hours" on GPU, ref README.md:59).

Sync rule (memory/axon-tpu-quirks): block_until_ready is broken on this
backend; every timed call fetches a scalar. SVDs are ms-scale, so per-call
dispatch (~600us) is amortized with a small in-jit repeat where needed.

Usage: python benchmarks/svd_bench.py [--json out.json]
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.ops.asvd import rank_for_param_ratio  # noqa: E402
from asvd4llm_tpu.ops.svd import randomized_svd  # noqa: E402

H, I = 4096, 11008

# (m, n, rank, tag): the ranks the pipeline requests at 7B
CASES = [
    (H, H, rank_for_param_ratio(H, H, 0.9, 1), "attn@scan-max(0.9)"),
    (H, H, rank_for_param_ratio(H, H, 0.85, 128), "attn@deploy(0.85)"),
    (H, H, 512, "attn@kv-grade"),
    (I, H, rank_for_param_ratio(H, I, 0.9, 1), "mlp@scan-max(0.9)"),
    (I, H, rank_for_param_ratio(H, I, 0.85, 128), "mlp@deploy(0.85)"),
]


@jax.jit
def _exact_sum(w):
    u, s, vh = jnp.linalg.svd(w, full_matrices=False)
    return jnp.sum(u[:, :8]) + jnp.sum(s[:8]) + jnp.sum(vh[:8])


def _rand_sum_fn(rank, niter):
    @jax.jit
    def f(w, key):
        u, s, vh = randomized_svd(w, rank, key=key, niter=niter)
        return jnp.sum(u[:, :8]) + jnp.sum(s) + jnp.sum(vh[:8])
    return f


def _time(f, *args, reps=3):
    float(f(*args))  # compile + channel setup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _accuracy(w, rank, key, niter):
    """Relative recomposition-error gap of randomized vs exact at `rank`."""
    @jax.jit
    def err(w, key):
        ue, se, vhe = jnp.linalg.svd(w, full_matrices=False)
        exact = (ue[:, :rank] * se[:rank][None]) @ vhe[:rank]
        ur, sr, vhr = randomized_svd(w, rank, key=key, niter=niter)
        rand = (ur * sr[None]) @ vhr
        nw = jnp.linalg.norm(w)
        return (jnp.linalg.norm(w - exact) / nw,
                jnp.linalg.norm(w - rand) / nw)
    e, r = err(w, key)
    return float(e), float(r)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--niter", type=int, default=8)
    ns = ap.parse_args(argv)

    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "cache", "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    results = []
    exact_times = {}  # (m, n) -> s (rank-independent: full SVD + truncate)
    for (m, n, rank, tag) in CASES:
        key, kw, kr = jax.random.split(key, 3)
        # heavy-tailed spectrum like real weights (not iid-normal flat)
        w = jax.random.normal(kw, (m, n), jnp.float32)
        scale = (jnp.arange(1, min(m, n) + 1, dtype=jnp.float32) ** -0.7)
        u, s, vh = jnp.linalg.svd(w, full_matrices=False)
        w = (u * (s * scale)[None, :]) @ vh

        if (m, n) not in exact_times:
            exact_times[(m, n)] = _time(_exact_sum, w)
        t_exact = exact_times[(m, n)]
        t_rand = _time(_rand_sum_fn(rank, ns.niter), w, kr)
        err_exact, err_rand = _accuracy(w, rank, kr, ns.niter)
        rec = {
            "shape": [m, n], "rank": rank, "tag": tag,
            "exact_s": round(t_exact, 3),
            "randomized_s": round(t_rand, 3),
            "speedup": round(t_exact / t_rand, 2),
            "rel_err_exact": round(err_exact, 5),
            "rel_err_randomized": round(err_rand, 5),
            "niter": ns.niter,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # 7B sensitivity-scan projection: one max-rank SVD per layer (the
    # one-SVD-per-layer trick, calib/sensitivity.py), llama-2-7b = 32 layers
    # x (q,k,v,o attn-shaped + gate,up,down mlp-shaped)
    def pick(tag):
        return next(r for r in results if r["tag"] == tag)

    attn = pick("attn@scan-max(0.9)")
    mlp = pick("mlp@scan-max(0.9)")
    n_attn, n_mlp = 32 * 4, 32 * 3
    proj = {
        "attn_svds": n_attn, "mlp_svds": n_mlp,
        "exact_total_s": round(n_attn * attn["exact_s"]
                               + n_mlp * mlp["exact_s"], 1),
        "randomized_total_s": round(n_attn * attn["randomized_s"]
                                    + n_mlp * mlp["randomized_s"], 1),
        "note": "factorization phase only; the scan's PPL evals run "
                "separately (bucketed compiles + batched rows, see "
                "calib/sensitivity.py)",
    }
    print(json.dumps({"llama7b_scan_factorization_projection": proj}),
          flush=True)

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "results": results, "projection_7b": proj}, f,
                      indent=2)


if __name__ == "__main__":
    main()
