"""Microbenchmark: dense vs XLA two-dot vs fused Pallas low-rank matmul.

Honest axon-tunnel methodology (see memory/axon-tpu-quirks): the op is
iterated inside one jit via lax.scan with weights as arguments, and each
rep syncs with a scalar host fetch. Usage: python benchmarks/kernel_bench.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.ops.lowrank import dense_apply, lowrank_apply  # noqa: E402
from asvd4llm_tpu.ops.pallas_lowrank import _fused_2d, _round_up  # noqa: E402

SHAPES = [
    # (M, K, N, R) decode shapes
    (16, 4096, 4096, 1920),     # llama7b qkv/o @ 0.85 (rank 1920 align128)
    (16, 11008, 4096, 2560),    # down @ 0.85
    (16, 4096, 11008, 2560),    # gate/up @ 0.85
    (16, 4096, 4096, 768),      # kv ratio 0.4 -> param 0.8 ... aggressive rank
]
ITERS = 100


def timer(f, *args, reps=4):
    float(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    for (M, K, N, R) in SHAPES:
        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (M, K), jnp.bfloat16)
        w = jax.random.normal(k2, (N, K), jnp.bfloat16) * 0.02
        a = jax.random.normal(k3, (N, R), jnp.bfloat16) * 0.03
        b = jax.random.normal(k4, (R, K), jnp.bfloat16) * 0.03
        # pre-padded args for the raw pallas kernel (pad once, not per iter)
        Mp = _round_up(max(M, 16), 16)
        Rp = _round_up(R, 128)
        tk = min(512, _round_up(K, 128)); tn = min(512, _round_up(N, 128))
        Kp = _round_up(K, tk); Np = _round_up(N, tn)
        xp = jnp.pad(x, ((0, Mp - M), (0, Kp - K)))
        ap = jnp.pad(a, ((0, Np - N), (0, Rp - R)))
        bp = jnp.pad(b, ((0, Rp - R), (0, Kp - K)))
        bias = jnp.zeros((1, Np), jnp.bfloat16)

        @jax.jit
        def f_dense(w, x):
            def body(c, _):
                y = dense_apply(c, w, None)
                return (c + y[:, :K] * 1e-6 if N >= K else c), ()
            # keep shapes stable: project y back into x-space cheaply
            def body2(c, _):
                y = dense_apply(c, w, None)
                c2 = c * 0.999 + jnp.sum(y) * 1e-12
                return c2, ()
            return jnp.sum(jax.lax.scan(body2, x, None, length=ITERS)[0])

        @jax.jit
        def f_xla(a, b, x):
            def body(c, _):
                y = lowrank_apply(c, a, b, None)
                c2 = c * 0.999 + jnp.sum(y) * 1e-12
                return c2, ()
            return jnp.sum(jax.lax.scan(body, x, None, length=ITERS)[0])

        @jax.jit
        def f_pallas(a, b, x, bias):
            def body(c, _):
                y = _fused_2d(c, a, b, bias, tk=tk, tn=tn)
                c2 = c * 0.999 + jnp.sum(y) * 1e-12
                return c2, ()
            return jnp.sum(jax.lax.scan(body, x, None, length=ITERS)[0])

        t_d = timer(f_dense, w, x)
        t_x = timer(f_xla, a, b, x)
        t_p = timer(f_pallas, ap, bp, xp, bias)
        gb_d = (N * K * 2) / t_d / 1e9
        gb_x = (R * (N + K) * 2) / t_x / 1e9
        gb_p = (Rp * (Np + Kp) * 2) / t_p / 1e9
        print(json.dumps({
            "shape": [M, K, N, R],
            "dense_us": round(t_d * 1e6, 1), "dense_gbps": round(gb_d, 1),
            "xla2dot_us": round(t_x * 1e6, 1), "xla_gbps": round(gb_x, 1),
            "pallas_us": round(t_p * 1e6, 1), "pallas_gbps": round(gb_p, 1),
            "pallas_vs_xla": round(t_x / t_p, 3),
            "lowrank_vs_dense": round(t_d / min(t_x, t_p), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
