"""Minimal generation CLI — drive a (compressed) checkpoint end to end.

Loads either a native Orbax+manifest checkpoint (export/checkpoint.py) or
an HF-format directory (factored ALinear/BLinear repos included), then
greedy-generates with the latent KV cache and fused kernels when the
model is KV-compressed.

Usage:
  python -m asvd4llm_tpu.tools.serve --model <dir> --prompt "..." \
      [--max_new_tokens 64] [--native] [--latent_kv] [--use_pallas]
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="checkpoint dir (HF format, or native with --native)")
    p.add_argument("--prompt", default="The")
    p.add_argument("--batch", default=None,
                   help="file with one prompt per line -> continuous-"
                        "batching paged engine (serving/engine.py)")
    p.add_argument("--page_size", type=int, default=128)
    p.add_argument("--num_pages", type=int, default=512)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--native", action="store_true",
                   help="load an Orbax+manifest checkpoint")
    p.add_argument("--latent_kv", nargs="?", const="kv", default="auto",
                   choices=["kv", "v", "auto", "dense"],
                   help="latent cache mode. Default 'auto' picks from the "
                        "measured envelope (serving/layout.py): latent-V "
                        "when v_proj ranks realize a saving (>= dense "
                        "throughput), dense otherwise. 'kv' forces fused "
                        "rank-dim k+v latents (max memory saving at "
                        "measured 0.46-0.95x throughput). Bare --latent_kv "
                        "means 'kv'. Applies to layers with low-rank k/v.")
    p.add_argument("--use_pallas", default=None, action="store_true",
                   help="force fused Pallas decode kernels (default: auto "
                        "— on when the kernel contract holds on TPU)")
    p.add_argument("--prefer_memory", action="store_true",
                   help="auto layout optimizes cache bytes over "
                        "throughput (picks fused latent-KV when possible)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--prefix_cache", type=int, default=0,
                   help="max cached prompt prefixes for automatic prefix "
                        "sharing across --batch requests (0 = off)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 = multinomial sampling")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from transformers import AutoTokenizer

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    tokenizer = AutoTokenizer.from_pretrained(args.model)
    if args.native:
        from asvd4llm_tpu.export.checkpoint import load_compressed
        params, spec, _ = load_compressed(args.model, dtype=dtype)
    else:
        from asvd4llm_tpu.models.loader import load_model_native
        params, spec = load_model_native(args.model, dtype=dtype)

    if args.batch:
        from asvd4llm_tpu.serving.engine import PagedEngine
        from asvd4llm_tpu.serving.paged import pages_needed

        with open(args.batch) as f:
            prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
        enc = [np.asarray(tokenizer.encode(p), np.int32) for p in prompts]
        longest = max(len(e) for e in enc) + args.max_new_tokens
        eng = PagedEngine(
            params, spec, max_batch=min(8, len(enc)),
            page_size=args.page_size, num_pages=args.num_pages,
            max_pages_per_seq=pages_needed(longest, args.page_size) + 1,
            latent=(False if args.latent_kv == "dense" else args.latent_kv),
            eos_token_id=tokenizer.eos_token_id, dtype=dtype,
            use_pallas=args.use_pallas, temperature=args.temperature,
            prefer_memory=args.prefer_memory,
            prefill_chunk=args.page_size if args.prefix_cache else 0,
            prefix_cache=args.prefix_cache)
        t0 = time.time()
        rids = [eng.add_request(e, max_new_tokens=args.max_new_tokens)
                for e in enc]
        eng.run(chunk=8)
        dt = time.time() - t0
        n = 0
        for prompt, rid in zip(prompts, rids):
            toks = eng.result(rid)
            n += len(toks)
            print(f"--- {prompt!r}\n{tokenizer.decode(toks.tolist())}")
        print(f"[{len(prompts)} requests, {n} tokens in {dt:.1f}s = "
              f"{n / dt:.1f} tok/s (incl. compile)]", file=sys.stderr)
        st = eng.stats()

        def _fmt(v):
            return "-" if v is None else f"{v * 1e3:.0f}ms"
        print(f"[ttft p50/p90/max {_fmt(st['ttft_s']['p50'])}/"
              f"{_fmt(st['ttft_s']['p90'])}/{_fmt(st['ttft_s']['max'])}  "
              f"tpot p50/p90 {_fmt(st['tpot_s']['p50'])}/"
              f"{_fmt(st['tpot_s']['p90'])}  "
              f"phase prefill/decode/host "
              f"{st['phase_s']['prefill']:.2f}/{st['phase_s']['decode']:.2f}"
              f"/{st['phase_s']['host']:.2f}s]", file=sys.stderr)
        return 0

    ids = np.asarray(tokenizer.encode(args.prompt), np.int32)[None, :]
    t0 = time.time()
    if args.temperature > 0:
        from asvd4llm_tpu.tools.selfgen import sample_generate
        out = sample_generate(params, spec, ids,
                              n_tokens=args.max_new_tokens,
                              temperature=args.temperature)
    else:
        from asvd4llm_tpu.eval.generate import generate_auto
        latent_kv, use_pallas = args.latent_kv, args.use_pallas
        if latent_kv == "auto" or use_pallas is None:
            from asvd4llm_tpu.serving.layout import choose_layout
            dec = choose_layout(params, spec,
                                prefer_memory=args.prefer_memory,
                                expected_T=ids.shape[1]
                                + args.max_new_tokens)
            if latent_kv == "auto":
                latent_kv = dec.latent
            if use_pallas is None:
                use_pallas = dec.use_pallas
            print(f"[layout auto: latent={dec.latent!r} "
                  f"use_pallas={dec.use_pallas} — {dec.reason}]",
                  file=sys.stderr)
        out = generate_auto(params, spec, ids,
                            max_new_tokens=args.max_new_tokens,
                            eos_token_id=tokenizer.eos_token_id,
                            latent_kv=(False if latent_kv == "dense"
                                       else latent_kv),
                            use_pallas=use_pallas)
    dt = time.time() - t0
    n_new = out.shape[1] - ids.shape[1]
    text = tokenizer.decode(out[0].tolist())
    print(text)
    print(f"[{n_new} tokens in {dt:.1f}s = {n_new / dt:.1f} tok/s "
          f"(incl. compile)]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
