"""Latent vs dense KV-cache decode: latency and cache-memory at long
context.

The latent cache's primary value is MEMORY (kv_cache_ratio becomes
physically real -> longer contexts / bigger batches per chip). The K-side
up-projection before RoPE costs FLOPs each step; this benchmark reports
both sides of the trade honestly on the real chip.

Usage: python benchmarks/kv_decode_bench.py [T]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from asvd4llm_tpu.eval.generate import decode_step, init_caches  # noqa: E402
from asvd4llm_tpu.models.init import init_params  # noqa: E402
from asvd4llm_tpu.models.registry import get_linear, lowrank_leaf, set_linear  # noqa: E402
from asvd4llm_tpu.models.spec import llama_spec  # noqa: E402
from asvd4llm_tpu.ops.asvd import factorize_linear  # noqa: E402


def cache_bytes(caches):
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize
               for c in caches for v in c.values())


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    B = 8
    # llama-3-8B-ish GQA geometry, 4 layers as a proxy stack
    # square (MHA) k/v projections like llama-2: for non-square GQA
    # projections the reference's kv accounting (param_ratio/2) does NOT
    # equal the realized rank/kv_dim ratio — see DESIGN.md §7
    spec = llama_spec(vocab_size=2048, hidden_size=1024,
                      intermediate_size=2816, num_layers=4, num_heads=16,
                      num_kv_heads=16, head_dim=64,
                      max_position_embeddings=T + 64)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    # kv ratio 0.4 -> param ratio 0.8 on k/v projections
    for i in range(spec.num_layers):
        for key in ("k_proj", "v_proj"):
            name = f"model.layers.{i}.self_attn.{key}"
            leaf = get_linear(params, spec, name)
            f = factorize_linear(leaf["w"], leaf["b"], 0.8, rank_align=8)
            params = set_linear(params, spec, name,
                                lowrank_leaf(f.A, f.B, f.bias))

    token = jnp.ones((B, 1), jnp.int32)
    pos = T - 8

    results = {}
    modes = (("dense", False, False), ("latent", True, False),
             ("latent_fused", True, True))
    STEPS = 32
    for mode, latent, fused in modes:
        caches = init_caches(params, spec, B, T - STEPS, jnp.bfloat16,
                             latent=latent)
        # pad caches to T so decode positions pos..pos+STEPS stay in range
        caches = init_caches(params, spec, B, T, jnp.bfloat16, latent=latent)

        # scan STEPS decode steps inside ONE jit: per-call host dispatch on
        # this tunnel is ~3ms, which would swamp per-step device time
        def run(params, token, caches, pos0, _fused=fused):
            def body(carry, _):
                tok, caches, p = carry
                logits, caches = decode_step(params, spec, tok, caches, p,
                                             use_pallas=_fused)
                tok = jnp.argmax(logits, -1)[:, None].astype(tok.dtype)
                return (tok, caches, p + 1), ()
            (tok, caches, _), _ = jax.lax.scan(
                body, (token, caches, pos0), None, length=STEPS)
            return jnp.sum(tok)

        run_j = jax.jit(run)
        pos0 = jnp.int32(pos - STEPS)
        float(run_j(params, token, caches, pos0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_j(params, token, caches, pos0))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        results[mode] = {"step_us": round(best * 1e6, 1),
                         "cache_mb": round(cache_bytes(caches) / 2 ** 20, 1)}
    results["cache_ratio"] = round(
        results["latent"]["cache_mb"] / results["dense"]["cache_mb"], 3)
    results["latency_ratio"] = round(
        results["latent"]["step_us"] / results["dense"]["step_us"], 3)
    results["T"] = T
    print(json.dumps(results))


if __name__ == "__main__":
    main()
