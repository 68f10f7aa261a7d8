"""Paged-decode phase dissection on chip (VERDICT r2 weak #2: dense paged
decode ran ~250 GB/s effective against the 840 GB/s chained-GEMM ceiling —
find out whether the kernel, the glue, or the engine eats the gap).

Times, at the serving bench's exact workload geometry (8 layers of 7B dims,
B=8, mixed positions), each layer of the stack separately:

  a. bare paged flash-decode attention kernel (dense K/V pools)
  b. one full paged_decode_step (weights + attention + scatter + head)
  c. paged_decode_scan of CHUNK steps (the engine's dispatch unit)
  d. the dense-weights matmul stack alone (decode_step on zero-length
     cache view is not constructible — approximated by a chained GEMM of
     the same weight set, the known-roofline reference)

Prints one JSON with per-phase times and effective GB/s.

Usage: python benchmarks/decode_profile.py [--json out.json]
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
from asvd4llm_tpu.models.init import init_params  # noqa: E402
from asvd4llm_tpu.models.spec import llama_spec  # noqa: E402
from asvd4llm_tpu.serving.paged import (  # noqa: E402
    init_paged_pools, paged_decode_scan, paged_decode_step,
)
from asvd4llm_tpu.ops.pallas_latent_attention import (  # noqa: E402
    paged_dense_decode_attention,
)

H, I, VOCAB = 4096, 11008, 32000
LAYERS = 8
PAGE = 256
CHUNK = 16
PROMPTS = [256, 512, 1024, 1536, 2048, 2560, 3072, 4032]


def _timeit(fn, reps=20):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ns = ap.parse_args(argv)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "cache",
                              "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    B = len(PROMPTS)
    spec = llama_spec(vocab_size=VOCAB, hidden_size=H, intermediate_size=I,
                      num_layers=LAYERS, num_heads=32, num_kv_heads=32,
                      head_dim=128,
                      max_position_embeddings=max(PROMPTS) + 128 + PAGE)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    on_tpu = jax.default_backend() == "tpu"

    # page pools sized like the serving bench
    from asvd4llm_tpu.serving.paged import pages_needed
    total_pages = sum(pages_needed(S + 128, PAGE) for S in PROMPTS) + 2
    max_pages = pages_needed(max(PROMPTS) + 128, PAGE) + 1
    pools = init_paged_pools(params, spec, total_pages, PAGE, jnp.bfloat16)
    pt = np.zeros((B, max_pages), np.int32)
    nxt = 1
    positions = np.asarray(PROMPTS, np.int32)
    for b, S in enumerate(PROMPTS):
        n = pages_needed(S + 128, PAGE)
        pt[b, :n] = range(nxt, nxt + n)
        nxt += n
    pt_j = jnp.asarray(pt)
    pos_j = jnp.asarray(positions)
    tok = jnp.ones((B, 1), jnp.int32)

    out = {"backend": jax.default_backend(),
           "geometry": {"B": B, "layers": LAYERS, "page": PAGE,
                        "positions": PROMPTS}, "phases": {}}

    # --- a. bare attention kernel, one layer ---------------------------
    q = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 128), jnp.bfloat16)
    k_pool = pools[0]["k"]
    v_pool = pools[0]["v"]
    att = jax.jit(lambda q, k, v: paged_dense_decode_attention(
        q, k, v, pt_j, pos_j, kv_heads=32, scale=0.0883883,
        interpret=not on_tpu))
    dt = _timeit(lambda: att(q, k_pool, v_pool))
    live_bytes = sum(int(p) + 1 for p in positions) * 32 * 128 * 2 * 2
    out["phases"]["attention_kernel_per_layer"] = {
        "us": round(dt * 1e6, 1),
        "live_kv_mb": round(live_bytes / 2 ** 20, 1),
        "effective_gbps": round(live_bytes / dt / 1e9, 1)}

    # --- b. one full decode step ---------------------------------------
    step = lambda: paged_decode_step(params, spec, tok, pools, pt_j, pos_j,
                                     use_pallas=on_tpu)
    dt_step = _timeit(lambda: step()[0], reps=10)
    weight_bytes = sum(
        int(np.prod(l[k]["w"].shape)) * 2
        for l in params["layers"] for k in
        ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
         "down_proj")) + VOCAB * H * 2 + VOCAB * H * 2
    total_bytes = weight_bytes + live_bytes * LAYERS
    out["phases"]["decode_step"] = {
        "us": round(dt_step * 1e6, 1),
        "weight_mb": round(weight_bytes / 2 ** 20, 1),
        "total_traffic_mb": round(total_bytes / 2 ** 20, 1),
        "effective_gbps": round(total_bytes / dt_step / 1e9, 1)}

    # --- c. the engine's scan chunk ------------------------------------
    def chunk():
        toks, _ = paged_decode_scan(params, spec, tok, pools, pt_j, pos_j,
                                    CHUNK, use_pallas=on_tpu)
        return toks
    dt_chunk = _timeit(chunk, reps=5)
    out["phases"]["decode_scan_chunk"] = {
        "n_steps": CHUNK,
        "us_per_step": round(dt_chunk / CHUNK * 1e6, 1),
        "effective_gbps": round(total_bytes * CHUNK / dt_chunk / 1e9, 1),
        "tokens_per_sec": round(B * CHUNK / dt_chunk, 1)}

    # --- d. weight-stack GEMM reference (roofline) ---------------------
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H), jnp.bfloat16)

    @jax.jit
    def gemms(x):
        h = x
        for layer in params["layers"]:
            for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
                h = h @ layer[k]["w"].T * 1e-3 + x
            g = h @ layer["gate_proj"]["w"].T
            u = h @ layer["up_proj"]["w"].T
            h = (g * u) @ layer["down_proj"]["w"].T * 1e-3 + x
        return h
    dt_g = _timeit(lambda: gemms(x))
    w_only = weight_bytes - 2 * VOCAB * H * 2
    out["phases"]["weight_gemm_stack"] = {
        "us": round(dt_g * 1e6, 1),
        "effective_gbps": round(w_only / dt_g / 1e9, 1)}

    print(json.dumps(out, indent=1))
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
