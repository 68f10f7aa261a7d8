"""Self-generated calibration sets (ref tools/selfgen.py:5-35): sample
token-by-token from the model itself (multinomial) starting from a short
seed, producing calibration text in the model's own distribution — used
for chat models whose deployment distribution differs from wikitext.

TPU-native: the per-token loop reuses the jitted decode_step with a KV
cache (the reference re-feeds a manual past_key_values loop in torch).
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.eval.generate import decode_step, init_caches, prefill_host

log = logging.getLogger(__name__)


def sample_generate(params, spec, seed_ids, *, n_tokens: int,
                    temperature: float = 1.0, key=None) -> np.ndarray:
    """Multinomial sampling continuation of seed_ids [B, S]."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ids = jnp.asarray(np.asarray(seed_ids))
    B, S = ids.shape
    caches = init_caches(params, spec, B, S + n_tokens,
                         params["embed_tokens"].dtype)
    logits, caches = prefill_host(params, spec, ids, caches)
    out = [np.asarray(ids)]
    for step in range(n_tokens):
        key, sub = jax.random.split(key)
        token = jax.random.categorical(sub, logits / temperature,
                                       axis=-1)[:, None].astype(ids.dtype)
        out.append(np.asarray(token))
        if step < n_tokens - 1:
            logits, caches = decode_step(params, spec, token, caches, S + step)
    return np.concatenate(out, axis=1)


def gen_calib_set(params, spec, tokenizer, model_id: str, *,
                  nsamples: int = 32, seqlen: int = 2048,
                  seed_text: str = "The ", seed: int = 0,
                  cache_dir: str = "cache", use_cache: bool = True
                  ) -> list[dict]:
    """Build and cache a selfgen calibration set (loader contract identical
    to data.get_calib_data)."""
    os.makedirs(cache_dir, exist_ok=True)
    cache_file = os.path.join(
        cache_dir, f"selfgen_{model_id.replace('/', '_')}_{nsamples}_"
                   f"{seqlen}_{seed}.npz")
    if use_cache and os.path.exists(cache_file):
        z = np.load(cache_file)
        return [{"input_ids": z[f"ids_{i}"],
                 "attention_mask": np.ones_like(z[f"ids_{i}"])}
                for i in range(int(z["n"]))]

    seed_ids = np.asarray(tokenizer.encode(seed_text), np.int32)[None, :2]
    key = jax.random.PRNGKey(seed)
    samples = []
    for i in range(nsamples):
        key, sub = jax.random.split(key)
        toks = sample_generate(params, spec, seed_ids,
                               n_tokens=seqlen - seed_ids.shape[1], key=sub)
        samples.append(toks.astype(np.int64))
        log.info("selfgen sample %d/%d", i + 1, nsamples)
    np.savez(cache_file, n=len(samples),
             **{f"ids_{i}": s for i, s in enumerate(samples)})
    return [{"input_ids": s, "attention_mask": np.ones_like(s)}
            for s in samples]
