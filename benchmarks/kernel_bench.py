"""Microbenchmark: dense vs XLA two-dot vs fused Pallas low-rank matmul.

Axon-tunnel methodology (memory/axon-tpu-quirks + round-2 finding):
- weights are jit ARGUMENTS (constants bake into HLO -> 413 on upload);
- block_until_ready does not sync on this backend: each rep fetches a
  scalar;
- lax.scan amortizes the ~600us dispatch, BUT each scan ITERATION also
  carries ~140us of fixed overhead on this backend — a single decode-sized
  op (~40us) per body under-reports bandwidth 4-5x. The op is therefore
  CHAINED `DEPTH` times inside each scan body (alternating K->N / N->K
  weight pairs so the dataflow is real), and the per-op time is
  body_time / DEPTH. At DEPTH=8 the dense GEMM measures ~840 GB/s ==
  the v5e HBM roofline, validating the method.

Usage: python benchmarks/kernel_bench.py [--json out.json]
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.ops.lowrank import dense_apply, lowrank_apply  # noqa: E402
from asvd4llm_tpu.ops.pallas_lowrank import _fused_2d, _round_up  # noqa: E402

SHAPES = [
    # (M, K, N, R) decode shapes (llama-2-7b projections)
    (16, 4096, 4096, 1920),     # q/k/v/o @ ratio 0.85 (rank_align 128)
    (16, 4096, 11008, 2560),    # gate/up @ 0.85 (and down in the reverse leg)
    (16, 4096, 4096, 768),      # kv-compression-grade rank
    (16, 4096, 4096, 512),
]
ITERS = 50
DEPTH = 8  # ops chained per scan body (must be even: K->N then N->K legs)


def timer(f, *args, reps=4):
    float(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, (time.perf_counter() - t0) / (ITERS * DEPTH))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write results here")
    ns = ap.parse_args(argv)

    results = []
    for (M, K, N, R) in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
        # forward (K->N) and reverse (N->K) weights so the chain's dataflow
        # is real; traffic per op is identical (K*N dense, R*(K+N) low-rank)
        w_f = jax.random.normal(ks[1], (N, K), jnp.bfloat16) * 0.02
        w_r = jax.random.normal(ks[2], (K, N), jnp.bfloat16) * 0.02
        a_f = jax.random.normal(ks[3], (N, R), jnp.bfloat16) * 0.03
        b_f = jax.random.normal(ks[4], (R, K), jnp.bfloat16) * 0.03
        a_r = jax.random.normal(ks[5], (K, R), jnp.bfloat16) * 0.03
        b_r = jax.random.normal(ks[6], (R, N), jnp.bfloat16) * 0.03

        # pre-padded args for the raw pallas kernel (pad once, not per iter)
        Mp = _round_up(max(M, 16), 16)
        Rp = _round_up(R, 128)
        tk = min(512, _round_up(K, 128)); tn = min(512, _round_up(N, 128))
        Kp = _round_up(K, tk); Np = _round_up(N, tn)
        xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
        ap_f = jnp.pad(a_f, ((0, Np - N), (0, Rp - R)))
        bp_f = jnp.pad(b_f, ((0, Rp - R), (0, Kp - K)))
        ap_r = jnp.pad(a_r, ((0, Kp - K), (0, Rp - R)))
        bp_r = jnp.pad(b_r, ((0, Rp - R), (0, Np - N)))
        bias_n = jnp.zeros((1, Np), jnp.bfloat16)
        bias_k = jnp.zeros((1, Kp), jnp.bfloat16)

        @jax.jit
        def f_dense(w_f, w_r, x):
            def body(c, _):
                for _ in range(DEPTH // 2):
                    c = dense_apply(dense_apply(c, w_f, None), w_r, None) * 0.5
                return c, ()
            return jnp.sum(jax.lax.scan(body, x, None, length=ITERS)[0])

        @jax.jit
        def f_xla(a_f, b_f, a_r, b_r, x):
            def body(c, _):
                for _ in range(DEPTH // 2):
                    c = lowrank_apply(lowrank_apply(c, a_f, b_f, None),
                                      a_r, b_r, None) * 0.5
                return c, ()
            return jnp.sum(jax.lax.scan(body, x, None, length=ITERS)[0])

        @jax.jit
        def f_pallas(a_f, b_f, a_r, b_r, x, bias_n, bias_k):
            def body(c, _):
                for _ in range(DEPTH // 2):
                    y = _fused_2d(c, a_f, b_f, bias_n, tk=tk, tn=tn)
                    c = _fused_2d(y, a_r, b_r, bias_k, tk=tn, tn=tk) * 0.5
                return c, ()
            return jnp.sum(jax.lax.scan(body, x, None, length=ITERS)[0])

        t_d = timer(f_dense, w_f, w_r, x)
        t_x = timer(f_xla, a_f, b_f, a_r, b_r, x)
        t_p = timer(f_pallas, ap_f, bp_f, ap_r, bp_r, xp, bias_n, bias_k)
        gb_d = (N * K * 2) / t_d / 1e9
        gb_x = (R * (N + K) * 2) / t_x / 1e9
        gb_p = (Rp * (Np + Kp) * 2) / t_p / 1e9
        rec = {
            "shape": [M, K, N, R],
            "dense_us": round(t_d * 1e6, 1), "dense_gbps": round(gb_d, 1),
            "xla2dot_us": round(t_x * 1e6, 1), "xla_gbps": round(gb_x, 1),
            "pallas_us": round(t_p * 1e6, 1), "pallas_gbps": round(gb_p, 1),
            "pallas_vs_xla": round(t_x / t_p, 3),
            "lowrank_vs_dense": round(t_d / min(t_x, t_p), 3),
            "traffic_ratio_theory": round((N * K) / (R * (N + K)), 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump({"iters": ITERS, "depth": DEPTH,
                       "backend": jax.default_backend(),
                       "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
