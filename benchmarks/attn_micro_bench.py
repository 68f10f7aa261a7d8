"""Isolated decode-attention micro-benchmark (round-3 VERDICT #5 diagnosis).

The full-model decode bench (model_decode_bench.py) showed latent-V at
gqa8/T4096 LOSING to dense (0.904x) while theory says absorbed-V saves
(KV*hd - Rv) floats of V-cache traffic per token. This bench times ONLY the
attention step (q/k/v/o projections + cache attention, no MLP / embeddings /
lm_head) so the formulation differences aren't diluted by weight traffic,
across:

  dense         _attend_step, dense {k,v} cache          (baseline)
  latent_v      _attend_step, dense K + latent V (XLA einsum path)
  latent_v_flat bench-local reimpl: probs flattened to [B, H, T] and the
                absorbed numerator as ONE dot_general (diagnoses whether
                XLA's lowering of the bgrk,bkv->bgrv einsum re-reads tv)
  latent_kv     _attend_step, full latent cache, XLA (up-project + attend)
  latent_fused  _attend_step, full latent cache, fused Pallas kernel
  paged_dense   paged flash-decode kernel, identity page table
  paged_lv      paged flash-decode kernel, V-latent pages

Timing follows the axon rules: 16 chained steps inside one jit'd lax.scan,
sync via scalar fetch, weights as jit args.

Usage: python benchmarks/attn_micro_bench.py [--json out.json]
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.eval.generate import _attend_step  # noqa: E402
from asvd4llm_tpu.models.decoder import rope_cos_sin  # noqa: E402
from asvd4llm_tpu.models.registry import dense_leaf, lowrank_leaf  # noqa: E402
from asvd4llm_tpu.models.spec import llama_spec  # noqa: E402
from asvd4llm_tpu.ops.asvd import rank_for_param_ratio  # noqa: E402

HID = 4096
STEPS = 16
B = 8


def _mk_lowrank(key, out_f, in_f, ratio, align=8):
    r = rank_for_param_ratio(in_f, out_f, ratio, align)
    k1, k2 = jax.random.split(key)
    a = (jax.random.normal(k1, (out_f, r)) * (r ** -0.5)).astype(jnp.bfloat16)
    b = (jax.random.normal(k2, (r, in_f)) * (in_f ** -0.5)).astype(jnp.bfloat16)
    return lowrank_leaf(a, b, None)


def _mk_dense(key, out_f, in_f):
    w = (jax.random.normal(key, (out_f, in_f)) * (in_f ** -0.5)
         ).astype(jnp.bfloat16)
    return dense_leaf(w, None)


def _time(fn, *args, reps=5):
    float(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e6  # us per step


def _scan_attend(spec, pos0, up):
    """Jit: scan STEPS attention steps, threading the cache."""
    @jax.jit
    def run(layer, x, cache, cos_full, sin_full):
        def body(carry, _):
            x, cache, p = carry
            out, cache = _attend_step(spec, layer, x, cache, p,
                                      cos_full, sin_full, 0, up=up)
            return (out, cache, p + 1), ()
        (out, _, _), _ = jax.lax.scan(
            body, (x, cache, jnp.int32(pos0)), None, length=STEPS)
        return jnp.sum(out.astype(jnp.float32))
    return run


def bench_geo(kv_heads, T, ratio=0.8, page=256):
    spec = llama_spec(vocab_size=256, hidden_size=HID, intermediate_size=HID,
                      num_layers=1, num_heads=32, num_kv_heads=kv_heads,
                      head_dim=128, max_position_embeddings=T + 64)
    KV, hd, H = kv_heads, 128, 32
    rep = H // KV
    key = jax.random.PRNGKey(0)
    ks = list(jax.random.split(key, 12))
    q_leaf = _mk_dense(ks[0], H * hd, HID)
    o_leaf = _mk_dense(ks[1], HID, H * hd)
    k_dense = _mk_dense(ks[2], KV * hd, HID)
    v_dense = _mk_dense(ks[3], KV * hd, HID)
    k_low = _mk_lowrank(ks[4], KV * hd, HID, ratio)
    v_low = _mk_lowrank(ks[5], KV * hd, HID, ratio)
    Rk, Rv = k_low["A"].shape[1], v_low["A"].shape[1]

    x = jax.random.normal(ks[6], (B, 1, HID)).astype(jnp.bfloat16)
    pos0 = T - STEPS - 1
    cos_full, sin_full = rope_cos_sin(jnp.arange(T), hd, spec.rope_theta)
    kc = jax.random.normal(ks[7], (B, T, KV, hd)).astype(jnp.bfloat16)
    vc = jax.random.normal(ks[8], (B, T, KV, hd)).astype(jnp.bfloat16)
    tkc = jax.random.normal(ks[9], (B, T, Rk)).astype(jnp.bfloat16)
    tvc = jax.random.normal(ks[10], (B, T, Rv)).astype(jnp.bfloat16)

    rec = {"Rk": Rk, "Rv": Rv}

    def run_mode(name, layer, cache, up=False):
        fn = _scan_attend(spec, pos0, up)
        rec[name] = round(_time(fn, layer, x, cache, cos_full, sin_full), 1)

    dense_layer = {"q_proj": q_leaf, "k_proj": k_dense, "v_proj": v_dense,
                   "o_proj": o_leaf}
    lv_layer = {"q_proj": q_leaf, "k_proj": k_dense, "v_proj": v_low,
                "o_proj": o_leaf}
    lkv_layer = {"q_proj": q_leaf, "k_proj": k_low, "v_proj": v_low,
                 "o_proj": o_leaf}
    run_mode("dense", dense_layer, {"k": kc, "v": vc})
    run_mode("latent_v", lv_layer, {"k": kc, "tv": tvc})
    run_mode("latent_kv", lkv_layer, {"tk": tkc, "tv": tvc})
    if jax.default_backend() != "cpu":  # fused kernel needs real TPU
        run_mode("latent_fused", lkv_layer, {"tk": tkc, "tv": tvc}, up=True)
    else:
        rec["latent_fused"] = rec["latent_kv"]

    # --- bench-local flattened-numerator latent_v variant -----------------
    scale = hd ** -0.5

    @jax.jit
    def run_flat(q_leaf, o_leaf, k_dense, v_low, x, kc, tvc):
        a_v = v_low["A"].reshape(KV, hd, Rv)

        def body(carry, _):
            x, kc, tvc, p = carry
            q = jax.lax.dot_general(
                x, q_leaf["w"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(B, 1, H, hd)
            cos_q = jax.lax.dynamic_slice_in_dim(cos_full, p, 1)
            sin_q = jax.lax.dynamic_slice_in_dim(sin_full, p, 1)
            from asvd4llm_tpu.models.decoder import apply_rope
            q = apply_rope(q, cos_q, sin_q)
            k_new = jax.lax.dot_general(
                x, k_dense["w"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(B, 1, KV, hd)
            k_new = apply_rope(k_new, cos_q, sin_q)
            tv_new = jax.lax.dot_general(
                x, v_low["B"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
            kc2 = jax.lax.dynamic_update_slice(
                kc, k_new.astype(kc.dtype), (0, p, 0, 0))
            tvc2 = jax.lax.dynamic_update_slice(
                tvc, tv_new.astype(tvc.dtype), (0, p, 0))
            qg = q[:, 0].reshape(B, KV, rep, hd)
            logits = jnp.einsum("bgrd,bkgd->bgrk", qg, kc2,
                                preferred_element_type=jnp.float32) * scale
            mask = jnp.where(jnp.arange(T) <= p, 0.0, jnp.float32(-1e30))
            probs = jax.nn.softmax(logits + mask[None, None, None, :], -1)
            # FLAT numerator: one [B, H, T] @ [B, T, Rv] batched dot
            pf = probs.reshape(B, H, T).astype(tvc2.dtype)
            s = jax.lax.dot_general(
                pf, tvc2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # [B, H, Rv]
            out = jnp.einsum("bgrv,gdv->bgrd",
                             s.reshape(B, KV, rep, Rv).astype(a_v.dtype),
                             a_v, preferred_element_type=jnp.float32)
            out = out.reshape(B, 1, H * hd).astype(x.dtype)
            out = jax.lax.dot_general(
                out, o_leaf["w"], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
            return (out, kc2, tvc2, p + 1), ()
        (out, _, _, _), _ = jax.lax.scan(
            body, (x, kc, tvc, jnp.int32(pos0)), None, length=STEPS)
        return jnp.sum(out.astype(jnp.float32))

    rec["latent_v_flat"] = round(
        _time(run_flat, q_leaf, o_leaf, k_dense, v_low, x, kc, tvc), 1)

    # --- paged kernels, identity page table -------------------------------
    from asvd4llm_tpu.ops.pallas_latent_attention import (
        paged_dense_decode_attention,
    )
    P = page
    assert T % P == 0, (T, P)
    nP = T // P
    pt = jnp.arange(B * nP, dtype=jnp.int32).reshape(B, nP)
    k_pool = kc.reshape(B * nP, P, KV, hd)
    v_pool = vc.reshape(B * nP, P, KV, hd)
    tv_pool = tvc.reshape(B * nP, P, Rv)
    positions = jnp.full((B,), pos0, jnp.int32)

    def paged_runner(v_latent):
        @jax.jit
        def run(q_leaf, o_leaf, x, k_pool, v_pool, a_v):
            def body(carry, _):
                x, p = carry
                q = jax.lax.dot_general(
                    x, q_leaf["w"], (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).astype(x.dtype).reshape(B, 1, H, hd)
                from asvd4llm_tpu.models.decoder import apply_rope
                cos_q = jax.lax.dynamic_slice_in_dim(cos_full, p, 1)
                sin_q = jax.lax.dynamic_slice_in_dim(sin_full, p, 1)
                q = apply_rope(q, cos_q, sin_q)[:, 0]
                out = paged_dense_decode_attention(
                    q, k_pool, v_pool, pt, positions, kv_heads=KV,
                    scale=scale, a_v=a_v,
                    interpret=jax.default_backend() == "cpu")
                out = out[:, None, :].astype(x.dtype)
                out = jax.lax.dot_general(
                    out, o_leaf["w"], (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(x.dtype)
                return (out, p + 1), ()
            (out, _), _ = jax.lax.scan(body, (x, jnp.int32(pos0)), None,
                                       length=STEPS)
            return jnp.sum(out.astype(jnp.float32))
        return run

    rec["paged_dense"] = round(_time(
        paged_runner(False), q_leaf, o_leaf, x, k_pool, v_pool, None), 1)
    rec["paged_lv"] = round(_time(
        paged_runner(True), q_leaf, o_leaf, x, k_pool, tv_pool,
        v_low["A"]), 1)

    for m in ("latent_v", "latent_v_flat", "latent_kv", "latent_fused",
              "paged_dense", "paged_lv"):
        rec[f"{m}_vs_dense"] = round(rec["dense"] / rec[m], 3)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--contexts", default="1024,4096")
    ap.add_argument("--geos", default="gqa8,mha32")
    ap.add_argument("--page", type=int, default=256,
                    help="paged-kernel page size (sweepable, VERDICT r4 #4)")
    ns = ap.parse_args(argv)
    geos = {"gqa8": 8, "mha32": 32}
    out = {"backend": jax.default_backend(), "batch": B, "steps": STEPS,
           "page": ns.page,
           "runs": {}}
    for g in ns.geos.split(","):
        for T in (int(t) for t in ns.contexts.split(",")):
            rec = bench_geo(geos[g], T, page=ns.page)
            out["runs"][f"{g}_T{T}"] = rec
            print(json.dumps({f"{g}_T{T}": rec}), flush=True)
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
