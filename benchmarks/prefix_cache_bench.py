"""Prefix-cache serving benchmark: shared-system-prompt workload.

Workload: N requests sharing one long system prompt (SYS tokens) with
short unique tails, admitted sequentially through chunked prefill (the
realistic serving arrival pattern). Measures the full generate wall
clock and TTFT percentiles with the prefix cache off vs on — the cache
skips the shared whole pages at prefill for every request after the
first, so admission cost drops from O(N * SYS) to O(SYS + N * tail).

Usage: python benchmarks/prefix_cache_bench.py [--json out.json]
"""
import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from asvd4llm_tpu.models.init import init_params  # noqa: E402
from asvd4llm_tpu.models.spec import llama_spec  # noqa: E402
from asvd4llm_tpu.serving.engine import PagedEngine  # noqa: E402
from asvd4llm_tpu.serving.paged import pages_needed  # noqa: E402

H, I, VOCAB = 4096, 11008, 32000
LAYERS = 8
PAGE = 256
SYS = 2048          # shared system prompt (8 whole pages)
TAIL = 64           # unique user suffix
N_REQ = 8
MAX_NEW = 32
CHUNK = 8


def run(params, spec, prompts, *, prefix_cache, num_pages, max_pages):
    # concurrency 2 with a waiting queue: requests 3..N are admitted
    # AFTER earlier prefills registered the shared prefix — the arrival
    # pattern prefix caching exists for (all-at-once admission prefills
    # every copy in the same ticks and can never reuse)
    eng = PagedEngine(params, spec, max_batch=2, page_size=PAGE,
                      num_pages=num_pages, max_pages_per_seq=max_pages,
                      dtype=jnp.bfloat16,
                      use_pallas=jax.default_backend() == "tpu",
                      prefill_chunk=PAGE, prefix_cache=prefix_cache)
    t0 = time.perf_counter()
    rids = [eng.add_request(p, max_new_tokens=MAX_NEW) for p in prompts]
    eng.run(chunk=CHUNK)
    dt = time.perf_counter() - t0
    n_tok = sum(len(eng.result(r)) for r in rids)
    st = eng.stats()
    skipped = sum(1 for r in eng.requests.values())  # all requests
    return {
        "gen_tokens_per_sec": round(n_tok / dt, 1),
        "wall_s": round(dt, 3),
        "ttft_p50_s": None if st["ttft_s"]["p50"] is None
        else round(st["ttft_s"]["p50"], 3),
        "ttft_max_s": None if st["ttft_s"]["max"] is None
        else round(st["ttft_s"]["max"], 3),
        "phase_s": {k: round(v, 3) for k, v in st["phase_s"].items()},
        "requests": skipped,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ns = ap.parse_args(argv)
    import os
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), "cache",
                              "jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    spec = llama_spec(vocab_size=VOCAB, hidden_size=H, intermediate_size=I,
                      num_layers=LAYERS, num_heads=32, num_kv_heads=32,
                      head_dim=128,
                      max_position_embeddings=SYS + TAIL + MAX_NEW + PAGE)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    sys_prompt = rng.randint(0, VOCAB, size=(SYS,))
    prompts = [np.concatenate([sys_prompt,
                               rng.randint(0, VOCAB, size=(TAIL,))])
               for _ in range(N_REQ)]
    seq_pages = pages_needed(SYS + TAIL + MAX_NEW + CHUNK, PAGE) + 1
    num_pages = 2 * seq_pages + pages_needed(SYS, PAGE) + 4

    out = {"geometry": {"hidden": H, "layers": LAYERS, "page": PAGE,
                        "sys": SYS, "tail": TAIL, "n_req": N_REQ,
                        "max_new": MAX_NEW},
           "backend": jax.default_backend(), "runs": {}}
    for name, pc in (("prefix_cache_off", 0), ("prefix_cache_on", 16)):
        run(params, spec, prompts, prefix_cache=pc, num_pages=num_pages,
            max_pages=seq_pages)            # warm (compiles)
        out["runs"][name] = run(params, spec, prompts, prefix_cache=pc,
                                num_pages=num_pages, max_pages=seq_pages)
        print(json.dumps({name: out["runs"][name]}), flush=True)
    off, on = out["runs"]["prefix_cache_off"], out["runs"]["prefix_cache_on"]
    out["speedup_wall"] = round(off["wall_s"] / on["wall_s"], 3)
    if ns.json:
        with open(ns.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({"speedup_wall": out["speedup_wall"]}))


if __name__ == "__main__":
    main()
