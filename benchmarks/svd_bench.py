"""On-chip SVD benchmark at 7B weight scale (round-2 VERDICT item #2).

Times exact (jnp.linalg.svd -> truncate) vs randomized subspace iteration
(ops/svd.py) for Llama-2-7B weight shapes in float32 at the ranks the
pipeline requests, measures the randomized path's recomposition-accuracy
gap, and projects the full 7B sensitivity-scan factorization wall time
(the phase the reference reports as "several hours" on GPU,
ref README.md:59).

Methodology notes (memory/axon-tpu-quirks):
- block_until_ready is broken on this backend: every timed call fetches a
  scalar;
- test matrices get a heavy-tailed spectrum via W = G1 @ diag(s) @ G2
  (two GEMMs, jitted) — SVD runtimes are value-independent, but the
  ACCURACY comparison needs a realistic decaying spectrum;
- exact SVD on TPU lowers to QDWH and is MINUTES at these sizes, so it is
  timed with a single rep (variance is irrelevant at that magnitude).

Usage: python benchmarks/svd_bench.py [--json out.json]
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.ops.asvd import rank_for_param_ratio  # noqa: E402
from asvd4llm_tpu.ops.svd import randomized_svd  # noqa: E402

H, I = 4096, 11008

CASES = [
    (H, H, rank_for_param_ratio(H, H, 0.9, 1), "attn@scan-max(0.9)"),
    (H, H, rank_for_param_ratio(H, H, 0.85, 128), "attn@deploy(0.85)"),
    (H, H, 512, "attn@kv-grade"),
    (I, H, rank_for_param_ratio(H, I, 0.9, 1), "mlp@scan-max(0.9)"),
    (I, H, rank_for_param_ratio(H, I, 0.85, 128), "mlp@deploy(0.85)"),
]


@functools.partial(jax.jit, static_argnames=("m", "n"))
def _make_weight(key, m, n):
    """Heavy-tailed-spectrum test matrix via two GEMMs (no eager SVD)."""
    k1, k2 = jax.random.split(key)
    r0 = min(m, n)
    s = jnp.arange(1, r0 + 1, dtype=jnp.float32) ** -0.7
    g1 = jax.random.normal(k1, (m, r0), jnp.float32) * (r0 ** -0.5)
    g2 = jax.random.normal(k2, (r0, n), jnp.float32) * (n ** -0.5)
    return (g1 * s[None, :]) @ g2


@jax.jit
def _exact_probe(w):
    u, s, vh = jnp.linalg.svd(w, full_matrices=False)
    return jnp.sum(u[:, :8]) + jnp.sum(s[:8]) + jnp.sum(vh[:8])


def _rand_probe(rank, niter):
    @jax.jit
    def f(w, key):
        u, s, vh = randomized_svd(w, rank, key=key, niter=niter)
        return jnp.sum(u[:, :8]) + jnp.sum(s) + jnp.sum(vh[:8])
    return f


def _err_fn(rank, niter):
    @jax.jit
    def f(w, key):
        ue, se, vhe = jnp.linalg.svd(w, full_matrices=False)
        exact = (ue[:, :rank] * se[:rank][None]) @ vhe[:rank]
        ur, sr, vhr = randomized_svd(w, rank, key=key, niter=niter)
        rand = (ur * sr[None]) @ vhr
        nw = jnp.linalg.norm(w)
        return jnp.stack([jnp.linalg.norm(w - exact) / nw,
                          jnp.linalg.norm(w - rand) / nw])
    return f


def _time(f, *args, reps=2):
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))  # compile + run
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*args)))
        best = min(best, time.perf_counter() - t0)
    return best, first


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--niter", type=int, default=8)
    ap.add_argument("--skip_accuracy", action="store_true")
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
    exact_times = {}
    weights = {}
    for (m, n, rank, tag) in CASES:
        key, kw, kr = jax.random.split(key, 3)
        if (m, n) not in weights:
            weights[(m, n)] = _make_weight(kw, m, n)
        w = weights[(m, n)]
        print(f"# {tag}: shape=({m},{n}) rank={rank}", file=sys.stderr,
              flush=True)

        if (m, n) not in exact_times:
            t, first = _time(_exact_probe, w, reps=1)
            exact_times[(m, n)] = t
            print(f"#   exact: {t:.2f}s (first incl compile {first:.1f}s)",
                  file=sys.stderr, flush=True)
        t_exact = exact_times[(m, n)]
        t_rand, first = _time(_rand_probe(rank, ns.niter), w, kr, reps=2)
        print(f"#   randomized: {t_rand:.3f}s (first {first:.1f}s)",
              file=sys.stderr, flush=True)

        rec = {"shape": [m, n], "rank": rank, "tag": tag,
               "exact_s": round(t_exact, 3),
               "randomized_s": round(t_rand, 3),
               "speedup": round(t_exact / t_rand, 2),
               "niter": ns.niter}
        if not ns.skip_accuracy:
            errs = _err_fn(rank, ns.niter)(w, kr)
            rec["rel_err_exact"] = round(float(errs[0]), 5)
            rec["rel_err_randomized"] = round(float(errs[1]), 5)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def pick(tag):
        return next(r for r in results if r["tag"] == tag)

    attn, mlp = pick("attn@scan-max(0.9)"), pick("mlp@scan-max(0.9)")
    n_attn, n_mlp = 32 * 4, 32 * 3
    proj = {
        "attn_svds": n_attn, "mlp_svds": n_mlp,
        "exact_total_s": round(n_attn * attn["exact_s"]
                               + n_mlp * mlp["exact_s"], 1),
        "randomized_total_s": round(n_attn * attn["randomized_s"]
                                    + n_mlp * mlp["randomized_s"], 1),
        "note": "factorization phase only, one max-rank SVD per layer "
                "(the one-SVD-per-layer trick, calib/sensitivity.py); the "
                "scan's PPL evals are a separate budget",
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
