"""FULL-MODEL decode tokens/sec: dense vs low-rank weights vs latent-KV
(round-2 VERDICT item #4 — the layer-chain headline in bench.py is a
single-layer proxy; this measures the whole forward: embeddings, every
decoder layer with attention against a long cache, final norm, lm_head).

Geometry: Llama-2-7B layer dimensions (hidden 4096, inter 11008, 32 MHA
heads, vocab 32000) at LAYERS decoder layers — weights are created ON
DEVICE (shipping 7B of random weights through the axon tunnel is not
viable), and per-layer cost at fixed dims is depth-independent, so
tokens/sec extrapolates by layers/32 for the full 7B stack (reported).

Modes:
  dense          raw weights, dense KV cache (the reference's baseline)
  lowrank        all 7 projections factored @ ratio 0.85 (XLA dot-dot,
                 the shipped bf16 path), dense KV cache
  latent         k/v @ kv-ratio 0.4 (param 0.8), REALIZED latent cache
  latent_fused   same + the fused Pallas flash-decoding-over-latents kernel

Timing: STEPS greedy decode steps chained inside one jit (lax.scan);
per-rep sync via scalar fetch (block_until_ready is broken on axon).

Usage: python benchmarks/model_decode_bench.py [--json out.json]
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from asvd4llm_tpu.eval.generate import decode_step, init_caches  # noqa: E402
from asvd4llm_tpu.models.init import init_params  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    get_linear, lowrank_leaf, set_linear,
)
from asvd4llm_tpu.models.spec import llama_spec  # noqa: E402
from asvd4llm_tpu.ops.asvd import rank_for_param_ratio  # noqa: E402

H, I, VOCAB = 4096, 11008, 32000
LAYERS = 8          # 7B dims at reduced depth (see module docstring)
B = 8
STEPS = 16
FULL_7B_LAYERS = 32


def _rand_lowrank(key, out_f, in_f, ratio, rank_align, dtype):
    r = rank_for_param_ratio(in_f, out_f, ratio, rank_align)
    k1, k2 = jax.random.split(key)
    a = (jax.random.normal(k1, (out_f, r)) * (r ** -0.5)).astype(dtype)
    b = (jax.random.normal(k2, (r, in_f)) * (in_f ** -0.5)).astype(dtype)
    return lowrank_leaf(a, b, None)


def _factor_model(params, spec, keys, ratio, rank_align, key, dtype):
    """Replace the named projections with random rank-correct factors
    (speed benchmark: factor VALUES don't affect timing, shapes do)."""
    from asvd4llm_tpu.models.registry import linear_name
    for i in range(spec.num_layers):
        for k in keys:
            name = linear_name(spec, i, k)
            leaf = get_linear(params, spec, name)
            out_f, in_f = leaf["w"].shape
            key, sub = jax.random.split(key)
            params = set_linear(params, spec, name,
                                _rand_lowrank(sub, out_f, in_f, ratio,
                                              rank_align, dtype))
    return params


def cache_bytes(caches):
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize
               for c in caches for v in c.values())


def _time_decode(params, spec, caches, pos0, use_pallas, reps=3):
    token = jnp.ones((B, 1), jnp.int32)

    @jax.jit
    def run(params, token, caches, pos0):
        def body(carry, _):
            tok, caches, p = carry
            logits, caches = decode_step(params, spec, tok, caches, p,
                                         use_pallas=use_pallas)
            tok = jnp.argmax(logits, -1)[:, None].astype(tok.dtype)
            return (tok, caches, p + 1), ()
        (tok, _, _), _ = jax.lax.scan(body, (token, caches, jnp.int32(pos0)),
                                      None, length=STEPS)
        return jnp.sum(tok)

    float(run(params, token, caches, pos0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, token, caches, pos0))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--contexts", default="1024,4096")
    ns = ap.parse_args(argv)

    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "cache", "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    contexts = [int(t) for t in ns.contexts.split(",")]
    out = {"geometry": {"hidden": H, "inter": I, "layers": LAYERS,
                        "vocab": VOCAB, "batch": B},
           "backend": jax.default_backend(), "runs": {}}
    # MHA = llama-2-7b heads; GQA = llama-3-8B-like kv geometry, where the
    # latent-K up-projection is 4x cheaper and latent caching pays
    for geo_name, kv_heads in (("mha32", 32), ("gqa8", 8)):
        spec = llama_spec(vocab_size=VOCAB, hidden_size=H,
                          intermediate_size=I, num_layers=LAYERS,
                          num_heads=32, num_kv_heads=kv_heads, head_dim=128,
                          max_position_embeddings=max(contexts) + 64)
        key = jax.random.PRNGKey(0)
        dense = init_params(spec, key, dtype=jnp.bfloat16)
        all_keys = ("q_proj", "k_proj", "v_proj", "o_proj",
                    "gate_proj", "up_proj", "down_proj")
        lowrank = _factor_model(dense, spec, all_keys, 0.85, 128,
                                jax.random.PRNGKey(1), jnp.bfloat16)
        # kv-ratio 0.4 => param ratio 0.8 on square MHA k/v projections
        latent_m = _factor_model(dense, spec, ("k_proj", "v_proj"), 0.8, 8,
                                 jax.random.PRNGKey(2), jnp.bfloat16)

        for T in contexts:
            pos0 = T - STEPS - 1
            rec = {}
            for mode, params, latent, fused in (
                    ("dense", dense, False, False),
                    ("lowrank", lowrank, False, False),
                    ("latent", latent_m, True, False),
                    ("latent_fused", latent_m, True, True),
                    ("latent_v", latent_m, "v", False)):
                caches = init_caches(params, spec, B, T, jnp.bfloat16,
                                     latent=latent)
                t = _time_decode(params, spec, caches, pos0, fused)
                rec[mode] = {
                    "step_us": round(t * 1e6, 1),
                    "tokens_per_sec": round(B / t, 1),
                    "tokens_per_sec_7b_proj": round(B / (t * FULL_7B_LAYERS
                                                         / LAYERS), 1),
                    "cache_mb": round(cache_bytes(caches) / 2 ** 20, 1),
                }
                del caches
            for m in ("lowrank", "latent_fused", "latent_v"):
                rec[f"{m}_vs_dense"] = round(
                    rec["dense"]["step_us"] / rec[m]["step_us"], 3)
                rec[f"{m}_cache_ratio"] = round(
                    rec[m]["cache_mb"] / rec["dense"]["cache_mb"], 3)
            # the auto layout selector's pick on the kv-compressed model,
            # scored against THIS run's measured rows (serving/layout.py:
            # auto must never lose to dense while realizing cache saving)
            from asvd4llm_tpu.serving.layout import choose_layout
            # the selector chooses a LAYOUT for the compressed model, so
            # its dense-cache pick is the "lowrank" row (compressed
            # weights, dense cache) — "dense" is the uncompressed baseline
            choices = {False: "lowrank", "v": "latent_v",
                       "kv": "latent_fused"}
            argmax = min(choices.values(),
                         key=lambda m: rec[m]["step_us"])
            rec["argmax_layout"] = argmax
            for label, prefer in (("auto", False), ("auto_mem", True)):
                dec = choose_layout(latent_m, spec, prefer_memory=prefer,
                                    expected_T=T)
                picked = choices[dec.latent]
                rec[label] = {
                    "picked": picked, "use_pallas": dec.use_pallas,
                    "vs_dense": round(rec["dense"]["step_us"]
                                      / rec[picked]["step_us"], 3),
                    "cache_ratio": round(rec[picked]["cache_mb"]
                                         / rec["dense"]["cache_mb"], 3),
                    "matches_argmax": picked == argmax,
                }
            out["runs"][f"{geo_name}_T{T}"] = rec
            print(json.dumps({f"{geo_name}_T{T}": rec}), flush=True)

    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
