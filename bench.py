"""Headline benchmark (BASELINE.md north star): ASVD low-rank decode vs the
dense baseline on TPU.

Measures one Llama-2-7B-shaped decoder layer's seven projections
(q/k/v/o 4096x4096, gate/up 11008x4096, down 4096x11008) at the published
param_ratio 0.85 operating point (rank_align 128, the quantize.sh setting),
decode regime (batch 16, seqlen 1): dense matmuls vs fused-Pallas low-rank
matmuls. Decode is HBM-bandwidth-bound, so the speedup ceiling is the
traffic ratio K*N / (R*(K+N)) ≈ 1/0.85.

Prints ONE JSON line: value = low-rank decode tokens/sec through the layer
stack; vs_baseline = speedup vs dense (dense == what the reference's
SVDLinear-free model does on the same chip; >1.0 beats the baseline).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from asvd4llm_tpu.ops.asvd import rank_for_param_ratio
from asvd4llm_tpu.ops.lowrank import dense_apply
from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply

H, I = 4096, 11008
RATIO = 0.85
RANK_ALIGN = 128
BATCH = 16
SHAPES = [  # (out, in) of each projection in one llama-7b layer
    (H, H), (H, H), (H, H), (H, H),      # q, k, v, o
    (I, H), (I, H),                       # gate, up
    (H, I),                               # down
]


def build(dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    dense, lowrank = [], []
    for out_f, in_f in SHAPES:
        key, k1, k2, k3 = jax.random.split(key, 4)
        w = (jax.random.normal(k1, (out_f, in_f)) * 0.02).astype(dtype)
        r = rank_for_param_ratio(in_f, out_f, RATIO, RANK_ALIGN)
        a = (jax.random.normal(k2, (out_f, r)) * 0.05).astype(dtype)
        b = (jax.random.normal(k3, (r, in_f)) * 0.05).astype(dtype)
        dense.append(w)
        lowrank.append((a, b))
    return dense, lowrank


def layer_dense(ws, xh, xi):
    ys = [dense_apply(xh, w, None) for w in ws[:6]]
    ys.append(dense_apply(xi, ws[6], None))
    return sum(y.sum() for y in ys)


def layer_lowrank(fs, xh, xi, use_pallas=True):
    apply = (lambda x, a, b: fused_lowrank_apply(x, a, b, None)) if use_pallas \
        else (lambda x, a, b: dense_apply(dense_apply(x, b, None), a, None))
    ys = [apply(xh, a, b) for a, b in fs[:6]]
    ys.append(apply(xi, *fs[6]))
    return sum(y.sum() for y in ys)


def timeit(f, *args, iters=100):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    dense, lowrank = build()
    xh = jax.random.normal(jax.random.PRNGKey(9), (BATCH, H), jnp.bfloat16)
    xi = jax.random.normal(jax.random.PRNGKey(10), (BATCH, I), jnp.bfloat16)

    on_tpu = jax.default_backend() == "tpu"
    f_dense = jax.jit(lambda xh, xi: layer_dense(dense, xh, xi))
    f_lr = jax.jit(lambda xh, xi: layer_lowrank(lowrank, xh, xi,
                                                use_pallas=on_tpu))

    t_dense = timeit(f_dense, xh, xi)
    t_lr = timeit(f_lr, xh, xi)

    toks_dense = BATCH / t_dense
    toks_lr = BATCH / t_lr
    print(json.dumps({
        "metric": "llama7b_layer_decode_tokens_per_sec_lowrank_r0.85",
        "value": round(toks_lr, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(toks_lr / toks_dense, 4),
        "detail": {
            "dense_tokens_per_sec": round(toks_dense, 1),
            "dense_us": round(t_dense * 1e6, 1),
            "lowrank_us": round(t_lr * 1e6, 1),
            "backend": jax.default_backend(),
            "batch": BATCH,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
