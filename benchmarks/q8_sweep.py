"""q8 fused-kernel decode-regime sweep (VERDICT r4 item 3).

Times fused_lowrank_apply_q8 at the 7B serving decode shapes (M=16) across
tile caps and code pre-padding, against the XLA alternatives, then times a
whole q8 LAYER's seven projections back-to-back the way the engine
dispatches them. Output decides the default tile cap and quantifies the
pad-elimination win (ops/pallas_lowrank.py prepad_quantized_leaves).

Run AFTER the canonical pipeline run (chip is exclusive):
  python benchmarks/q8_sweep.py --json benchmarks/results/q8_sweep_r5.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, I = 4096, 11008
RATIO, ALIGN = 0.85, 128
M = 16          # b16 serving decode tokens/step
REPS = 64


def _rank(out_f, in_f):
    from asvd4llm_tpu.calib.search import rank_for_param_ratio
    return min(rank_for_param_ratio(in_f, out_f, RATIO, ALIGN), in_f, out_f)


def _mk_leaf(key, out_f, in_f):
    from asvd4llm_tpu.ops.quant import quantize_to_int
    r = _rank(out_f, in_f)
    a = jax.random.normal(key, (out_f, r), jnp.bfloat16) * 0.02
    b = jax.random.normal(key, (r, in_f), jnp.bfloat16) * 0.02
    a8, aq = quantize_to_int(a, 8)
    b8, bq = quantize_to_int(b, 8)
    return a8, aq, b8, bq, r


def _time(fn, sync, reps=REPS):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    sync()
    return (time.perf_counter() - t0) / reps * 1e6   # us/call


def main(argv=None):
    global H, I, M, REPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "would otherwise contend for the TPU claim)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims smoke (CI / CPU)")
    ns = ap.parse_args(argv)
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    if ns.tiny:
        H, I, M, REPS = 256, 384, 8, 2
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "cache", "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from asvd4llm_tpu.ops import pallas_lowrank as PL
    from asvd4llm_tpu.ops.lowrank import dense_apply, lowrank_apply
    from asvd4llm_tpu.ops.quant import dequantize

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, H), jnp.bfloat16)
    xi = jax.random.normal(key, (M, I), jnp.bfloat16)
    shapes = {"qkvo_4096x4096": (H, H), "gateup_11008x4096": (I, H),
              "down_4096x11008": (H, I)}
    gbps = 563e9
    out = {"M": M, "reps": REPS, "backend": jax.default_backend(),
           "shapes": {}}

    for sname, (out_f, in_f) in shapes.items():
        a8, aq, b8, bq, r = _mk_leaf(key, out_f, in_f)
        xx = x if in_f == H else xi
        dense_w = jax.random.normal(key, (out_f, in_f), jnp.bfloat16) * 0.02
        code_bytes = a8.size + b8.size
        rows = {"rank": int(r),
                "code_mb": round(code_bytes / 2**20, 1),
                "ideal_us_at_563gbps": round(code_bytes / gbps * 1e6, 1)}

        dense_j = jax.jit(lambda q: dense_apply(q, dense_w, None))
        rows["dense_xla_us"] = round(_time(
            lambda: dense_j(xx), lambda: float(dense_j(xx)[0, 0])), 1)

        # XLA dequant-then-dot (what the engine would do without pallas)
        @jax.jit
        def xla_q8(q, a8=a8, aq=aq, b8=b8, bq=bq):
            return lowrank_apply(q, dequantize(a8, aq, q.dtype),
                                 dequantize(b8, bq, q.dtype), None)
        rows["xla_dequant_us"] = round(_time(
            lambda: xla_q8(xx), lambda: float(xla_q8(xx)[0, 0])), 1)

        for cap in (512, 1024, 2048):
            for prepad in (False, True):
                if prepad:
                    Np = PL._round_up(out_f, 512)
                    Rp = PL._round_up(r, 128)
                    Kp = PL._round_up(in_f, 512)
                    a8u = PL._pad2(a8, Np, Rp)
                    b8u = PL._pad2(b8, Rp, Kp)
                else:
                    a8u, b8u = a8, b8
                f = jax.jit(functools.partial(
                    PL.fused_lowrank_apply_q8, a8=a8u, a_qp=aq, b8=b8u,
                    b_qp=bq, tile_cap=cap))
                tag = f"pallas_cap{cap}" + ("_prepad" if prepad else "")
                try:
                    rows[tag + "_us"] = round(_time(
                        lambda: f(xx), lambda: float(f(xx)[0, 0])), 1)
                except Exception as e:   # tile/VMEM rejection: record it
                    rows[tag + "_us"] = f"ERR {type(e).__name__}"
        out["shapes"][sname] = rows
        print(json.dumps({sname: rows}), flush=True)

    # whole-layer dispatch pattern: q,k,v,o + gate,up,down back to back,
    # REPS steps — captures per-call overhead the single-op loop hides
    leaves = [
        _mk_leaf(key, H, H), _mk_leaf(key, H, H), _mk_leaf(key, H, H),
        _mk_leaf(key, H, H), _mk_leaf(key, I, H), _mk_leaf(key, I, H),
        _mk_leaf(key, H, I)]
    for cap in (512, 1024, 2048):
        padded = []
        for a8, aq, b8, bq, r in leaves:
            a8p = PL._pad2(a8, PL._round_up(a8.shape[0], 512),
                           PL._round_up(a8.shape[1], 128))
            b8p = PL._pad2(b8, PL._round_up(b8.shape[0], 128),
                           PL._round_up(b8.shape[1], 512))
            padded.append((a8p, aq, b8p, bq))

        @jax.jit
        def layer_q8(q, padded=tuple(padded), cap=cap):
            def ap(i, h):
                a8p, aq, b8p, bq = padded[i]
                return PL.fused_lowrank_apply_q8(h, a8p, aq, b8p, bq,
                                                 tile_cap=cap)
            attn = sum(ap(i, q)[:, :1] for i in range(4))
            d = ap(6, ap(4, q) * ap(5, q))
            return attn + d[:, :1]
        t = _time(lambda: layer_q8(x), lambda: float(layer_q8(x)[0, 0]))
        out[f"layer7_prepad_cap{cap}_us"] = round(t, 1)
        print(json.dumps({f"layer7_prepad_cap{cap}_us": round(t, 1)}),
              flush=True)

    layer_code_bytes = sum(l[0].size + l[2].size for l in leaves)
    out["layer7_ideal_us"] = round(layer_code_bytes / gbps * 1e6, 1)
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
