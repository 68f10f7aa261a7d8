"""Autoregressive generation with dense or low-rank-latent KV caches.

The reference's KV-cache compression mode factorizes k_proj/v_proj and
*accounts* the cache ratio as the rank ratio, but the HF runtime still
caches full-dimension K/V (SURVEY §3.3; ref binary_search.py:94-96) — the
saving is never realized. Here we actually cache the rank-dim latents
``t = x @ B.T`` and reconstruct at attention time:

- V side is ABSORBED: the attention-weighted sum is taken over the V
  latents, and the up-projection A_v is applied to the (tiny) result —
  full V is never materialized, per-step cost is O(H*hd*Rv), independent
  of context length.
- K side latents are up-projected to head space before RoPE each step
  (RoPE does not commute with the up-projection, the same reason MLA
  needs decoupled RoPE keys). This trades FLOPs for HBM: the cache read
  shrinks from T*KV*hd to T*Rk.

Cache memory per token per layer: (Rk + Rv) vs 2*KV*hd dense — exactly the
kv_cache_ratio the search targets, now real.

Greedy generation (ref tools/eval_longbench.py:337-353 uses greedy
model.generate) with a jitted one-token decode step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import (
    _activation, apply_lm_head, apply_norm, apply_rope, attn_precision,
    forward_hidden, rope_cos_sin,
)
from asvd4llm_tpu.models.registry import is_lowrank
from asvd4llm_tpu.ops.lowrank import dense_apply, lowrank_apply


def layer_uses_latent_kv(layer) -> bool:
    return is_lowrank(layer["k_proj"]) and is_lowrank(layer["v_proj"])


def layer_uses_latent_v(layer) -> bool:
    return is_lowrank(layer["v_proj"])


def init_caches(params, spec, batch: int, max_len: int, dtype=jnp.bfloat16,
                *, latent=False) -> list:
    """Per-layer cache pytrees.

    latent=False: dense {"k","v"} [B,T,KV,hd].
    latent=True / "kv": {"tk","tv"} rank-dim latents (layers whose k AND v
      are low-rank); maximal memory saving, but the K-side up-projection
      before RoPE is COMPUTE-bound at MHA-sized kv_dim (measured:
      benchmarks/results/model_decode_bench_r2.json) — it pays at GQA
      geometry or aggressive ranks.
    latent="v": dense K + latent V {"k","tv"} (layers whose v is
      low-rank). V has no RoPE so its latents absorb exactly with
      T-independent per-step cost: strictly LESS HBM traffic than the
      dense cache AND (kv_dim + Rv)/(2*kv_dim) memory — the safe default
      serving point for KV-compressed MHA models."""
    kv_heads = spec.kv_dim // spec.head_dim
    caches = []
    for layer in params["layers"]:
        mode = latent if isinstance(latent, str) else ("kv" if latent else "")
        if mode == "kv" and layer_uses_latent_kv(layer):
            rk = layer["k_proj"]["A"].shape[1]
            rv = layer["v_proj"]["A"].shape[1]
            caches.append({
                "tk": jnp.zeros((batch, max_len, rk), dtype),
                "tv": jnp.zeros((batch, max_len, rv), dtype),
            })
        elif mode == "v" and layer_uses_latent_v(layer):
            rv = layer["v_proj"]["A"].shape[1]
            caches.append({
                "k": jnp.zeros((batch, max_len, kv_heads, spec.head_dim),
                               dtype),
                "tv": jnp.zeros((batch, max_len, rv), dtype),
            })
        else:
            caches.append({
                "k": jnp.zeros((batch, max_len, kv_heads, spec.head_dim),
                               dtype),
                "v": jnp.zeros((batch, max_len, kv_heads, spec.head_dim),
                               dtype),
            })
    return caches


def _apply_leaf(leaf, x, up=False):
    if "A8" in leaf or "A4" in leaf:  # quantized deployment leaves
        from asvd4llm_tpu.models.decoder import apply_linear
        return apply_linear(leaf, x)
    if is_lowrank(leaf):
        return lowrank_apply(x, leaf["A"], leaf["B"], leaf["b"],
                             use_pallas=up)
    return dense_apply(x, leaf["w"], leaf["b"])


def _latent(leaf, x):
    """Rank-dim latent t = x @ B.T (the cacheable quantity)."""
    return jax.lax.dot_general(
        x, leaf["B"], (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _up_k(leaf, t, B, T, KV, hd):
    """Latents [B,T,Rk] -> K heads [B,T,KV,hd] via A_k (+ bias)."""
    k = jax.lax.dot_general(
        t, leaf["A"], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if leaf["b"] is not None:
        k = k + leaf["b"].astype(jnp.float32)
    return k.astype(t.dtype).reshape(B, T, KV, hd)


def _gqa_probs(q0, k, rep, scale, softcap, mask_t):
    """Grouped-query attention probabilities WITHOUT materializing repeated
    K: query heads reshape to [B, KV, rep, hd] (HF repeat_interleave order)
    and contract against the raw [B, T, KV, hd] cache. At GQA geometry the
    jnp.repeat alternative writes rep x the cache to HBM every step — the
    dominant decode cost. mask_t: [T] shared or [B, T] per-sequence
    (ragged paged decode). Returns probs [B, KV, rep, T] f32."""
    B, H, hd = q0.shape
    KV = k.shape[2]
    qg = q0.reshape(B, KV, rep, hd)
    logits = jnp.einsum("bgrd,bkgd->bgrk", qg, k,
                        preferred_element_type=jnp.float32,
                        precision=attn_precision(qg.dtype)) * scale
    if softcap > 0:
        logits = softcap * jnp.tanh(logits / softcap)
    mask = mask_t[None, None, None, :] if mask_t.ndim == 1 \
        else mask_t[:, None, None, :]
    return jax.nn.softmax(logits + mask, axis=-1)


def _absorbed_v_out(probs, tv, v_leaf, KV, hd, rep, x_dtype):
    """Attention-weighted sum over Rv-dim latents + per-group V
    up-projection of the result (absorbed-V algebra; O(H*hd*Rv) per step,
    independent of context length). probs: [B, KV, rep, T].

    The numerator runs as ONE flattened [B, H, T] x [B, T, Rv] batched
    dot: the (g, r) axes are contiguous so the reshape is free, and the
    attn micro (attn_micro_r3.json latent_v_flat) measured XLA's lowering
    of the bgrk,bkv->bgrv einsum re-reading tv per group at long T
    (0.947x dense at gqa8/T4096 vs 1.017x flattened)."""
    B, _, _, T = probs.shape
    pf = probs.reshape(B, KV * rep, T).astype(tv.dtype)
    s = jax.lax.dot_general(pf, tv, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=attn_precision(tv.dtype))
    s = s.reshape(B, KV, rep, -1)                        # [B, KV, rep, Rv]
    a_v = v_leaf["A"].reshape(KV, hd, -1)                # [KV, hd, Rv]
    out = jnp.einsum("bgrv,gdv->bgrd", s.astype(a_v.dtype), a_v,
                     preferred_element_type=jnp.float32,
                     precision=attn_precision(a_v.dtype))
    if v_leaf["b"] is not None:
        # bias contributes sum(probs) * b = 1 * b after softmax
        vb = v_leaf["b"].reshape(KV, hd).astype(jnp.float32)
        out = out + vb[None, :, None, :]
    return out.astype(x_dtype).reshape(B, 1, KV * rep * hd)


def _attend_step(spec, layer, x, cache, pos, cos_full, sin_full, layer_idx,
                 up=False):
    """One-token attention (x: [B,1,H*hd]) against the cache; returns
    (attn_out, updated cache)."""
    B = x.shape[0]
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    T = (cache["tk"] if "tk" in cache else cache["k"]).shape[1]
    rep = H // KV

    q = _apply_leaf(layer["q_proj"], x, up).reshape(B, 1, H, hd)
    cos_q = jax.lax.dynamic_slice_in_dim(cos_full, pos, 1)
    sin_q = jax.lax.dynamic_slice_in_dim(sin_full, pos, 1)
    if spec.pos_emb == "rope":
        q = apply_rope(q, cos_q, sin_q)

    scale = spec.attn_scale if spec.attn_scale is not None else hd ** -0.5
    k_pos = jnp.arange(T)
    allow = k_pos <= pos
    if spec.layer_uses_sliding(layer_idx):
        allow &= k_pos > pos - spec.sliding_window
    mask_t = jnp.where(allow, 0.0, jnp.float32(-1e30))  # [T]

    if "tk" in cache:  # --- latent low-rank path ---
        tk_new = _latent(layer["k_proj"], x)            # [B,1,Rk]
        tv_new = _latent(layer["v_proj"], x)            # [B,1,Rv]
        tk = jax.lax.dynamic_update_slice(cache["tk"],
                                          tk_new.astype(cache["tk"].dtype),
                                          (0, pos, 0))
        tv = jax.lax.dynamic_update_slice(cache["tv"],
                                          tv_new.astype(cache["tv"].dtype),
                                          (0, pos, 0))
        new_cache = {"tk": tk, "tv": tv}

        if up and spec.pos_emb == "rope" and layer["k_proj"]["b"] is None:
            # fused flash-decoding over the latents (one pass, K never
            # materialized to HBM) — ops/pallas_latent_attention.py
            from asvd4llm_tpu.ops.pallas_latent_attention import \
                latent_decode_attention
            out = latent_decode_attention(
                q[:, 0], tk, tv, layer["k_proj"]["A"], layer["v_proj"]["A"],
                cos_full, sin_full, pos, kv_heads=KV, scale=scale,
                softcap=spec.attn_logit_softcap,
                sliding=spec.sliding_window
                if spec.layer_uses_sliding(layer_idx) else 0,
                v_bias=layer["v_proj"]["b"])
            out = out.astype(x.dtype)[:, None, :]
            o_key = "o_proj" if "o_proj" in layer else "out_proj"
            return _apply_leaf(layer[o_key], out, up), new_cache

        k = _up_k(layer["k_proj"], tk, B, T, KV, hd)
        if spec.pos_emb == "rope":
            k = apply_rope(k, cos_full, sin_full)
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_t)
        out = _absorbed_v_out(probs, tv, layer["v_proj"], KV, hd, rep,
                              x.dtype)
    elif "tv" in cache:  # --- dense K + absorbed latent V ("v" mode) ---
        k_new = _apply_leaf(layer["k_proj"], x, up).reshape(B, 1, KV, hd)
        tv_new = _latent(layer["v_proj"], x)             # [B,1,Rv]
        if spec.pos_emb == "rope":
            k_new = apply_rope(k_new, cos_q, sin_q)
        k = jax.lax.dynamic_update_slice(cache["k"],
                                         k_new.astype(cache["k"].dtype),
                                         (0, pos, 0, 0))
        tv = jax.lax.dynamic_update_slice(cache["tv"],
                                          tv_new.astype(cache["tv"].dtype),
                                          (0, pos, 0))
        new_cache = {"k": k, "tv": tv}
        # absorbed V (identical algebra to the full-latent path): the
        # weighted sum runs over Rv-dim latents, A_v applies to the result
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_t)
        out = _absorbed_v_out(probs, tv, layer["v_proj"], KV, hd, rep,
                              x.dtype)
    else:  # --- dense-cache path ---
        k_new = _apply_leaf(layer["k_proj"], x, up).reshape(B, 1, KV, hd)
        v_new = _apply_leaf(layer["v_proj"], x, up).reshape(B, 1, KV, hd)
        if spec.pos_emb == "rope":
            k_new = apply_rope(k_new, cos_q, sin_q)
        k = jax.lax.dynamic_update_slice(cache["k"],
                                         k_new.astype(cache["k"].dtype),
                                         (0, pos, 0, 0))
        v = jax.lax.dynamic_update_slice(cache["v"],
                                         v_new.astype(cache["v"].dtype),
                                         (0, pos, 0, 0))
        new_cache = {"k": k, "v": v}
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_t)
        out = jnp.einsum("bgrk,bkgd->bgrd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32,
                         precision=attn_precision(v.dtype))
        out = out.astype(x.dtype).reshape(B, 1, H * hd)

    o_key = "o_proj" if "o_proj" in layer else "out_proj"
    return _apply_leaf(layer[o_key], out, up), new_cache


def _decode_layer(spec, layer, x, cache, pos, cos_full, sin_full, layer_idx,
                  up=False, attend=None):
    """One decoder layer at decode time. `attend` lets callers swap the
    attention/cache implementation (serving/paged.py passes its paged
    attention with per-sequence positions); the MLP/norm plumbing is
    identical for every cache layout."""
    attend = attend or _attend_step
    if spec.family == "opt":
        residual = x
        h = apply_norm(spec, layer["ln1"], x) if spec.do_layer_norm_before else x
        attn, new_cache = attend(spec, layer, h, cache, pos, cos_full,
                                 sin_full, layer_idx, up=up)
        x = residual + attn
        if not spec.do_layer_norm_before:
            x = apply_norm(spec, layer["ln1"], x)
        residual = x
        h = apply_norm(spec, layer["ln2"], x) if spec.do_layer_norm_before else x
        h = _apply_leaf(layer["fc2"], _activation(spec, _apply_leaf(layer["fc1"], h, up)), up)
        x = residual + h
        if not spec.do_layer_norm_before:
            x = apply_norm(spec, layer["ln2"], x)
        return x, new_cache

    residual = x
    h = apply_norm(spec, layer["ln1"], x)
    attn, new_cache = attend(spec, layer, h, cache, pos, cos_full,
                             sin_full, layer_idx, up=up)
    if spec.post_attn_out_norm:
        attn = apply_norm(spec, layer["ln1_post"], attn)
    x = residual + attn
    residual = x
    h = apply_norm(spec, layer["ln2"], x)
    gate = _activation(spec, _apply_leaf(layer["gate_proj"], h, up))
    upv = _apply_leaf(layer["up_proj"], h, up)
    mlp = _apply_leaf(layer["down_proj"], gate * upv, up)
    if spec.post_mlp_out_norm:
        mlp = apply_norm(spec, layer["ln2_post"], mlp)
    return residual + mlp, new_cache


@functools.partial(jax.jit, static_argnames=("spec", "use_pallas"))
def decode_step(params, spec, token, caches, pos, use_pallas=False):
    """token: [B,1] -> (logits [B,vocab], new caches). pos: scalar int."""
    emb = params["embed_tokens"]
    x = emb[token]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:  # OPT-350m style
        x = _apply_leaf(params["project_in"], x)
    max_len = (caches[0]["k"] if "k" in caches[0] else caches[0]["tk"]).shape[1]
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][pos + spec.pos_offset][None, None, :]
        cos_full = sin_full = jnp.zeros((max_len, spec.head_dim))
    else:
        cos_full, sin_full = rope_cos_sin(jnp.arange(max_len), spec.head_dim,
                                          spec.rope_theta)
    new_caches = []
    for i, layer in enumerate(params["layers"]):
        x, c = _decode_layer(spec, layer, x, caches[i], pos, cos_full,
                             sin_full, i, up=use_pallas)
        new_caches.append(c)
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = _apply_leaf(params["project_out"], x)
    logits = apply_lm_head(params, spec, x)[:, 0]
    return logits, new_caches


@functools.partial(jax.jit, static_argnames=("spec",))
def prefill(params, spec, ids, caches):
    """Full-sequence forward that also fills dense caches; returns
    (last-position logits [B,vocab], caches)."""
    hidden, new_caches = forward_hidden(
        params, ids, spec,
        caches=[(c["k"], c["v"]) for c in caches], cache_pos=0)
    logits = apply_lm_head(params, spec, hidden[:, -1:, :])[:, 0]
    return logits, [{"k": k, "v": v} for k, v in new_caches]


def prefill_host(params, spec, ids, caches, *, latent=False):
    """Prefill wrapper handling the latent layout (latent layers get their
    latents computed directly; attention itself runs the normal full
    forward which is compute-bound anyway)."""
    if not latent:
        return prefill(params, spec, ids, caches)
    B, S = ids.shape
    if all("tk" in c for c in caches):
        # every layer is latent-cached: ONE pass computes both the logits
        # and the latents (no dense prefill needed)
        logits, latents = _prefill_latents_only(params, spec, jnp.asarray(
            np.asarray(ids)))
        out_caches = []
        for cache, (tk, tv) in zip(caches, latents):
            T = cache["tk"].shape[1]
            out_caches.append({
                "tk": jnp.pad(tk, ((0, 0), (0, T - S), (0, 0))
                              ).astype(cache["tk"].dtype),
                "tv": jnp.pad(tv, ((0, 0), (0, T - S), (0, 0))
                              ).astype(cache["tv"].dtype),
            })
        return logits, out_caches
    # mixed dense/latent layers: run the standard dense-cache prefill for
    # logits + dense entries, then one extra jitted pass for the latents
    dense_caches = init_caches(params, spec, B,
                               (caches[0]["tk"] if "tk" in caches[0]
                                else caches[0]["k"]).shape[1],
                               dtype=list(caches[0].values())[0].dtype,
                               latent=False)
    logits, filled = prefill(params, spec, ids, dense_caches)
    latents = _attention_input_latents(params, spec, ids)

    def padded(t, ref):
        T = ref.shape[1]
        return jnp.pad(t, ((0, 0), (0, T - S), (0, 0))).astype(ref.dtype)

    out_caches = []
    for i, cache in enumerate(caches):
        if "tk" in cache:
            tk, tv = latents[i]
            out_caches.append({"tk": padded(tk, cache["tk"]),
                               "tv": padded(tv, cache["tv"])})
        elif "tv" in cache:  # dense K + latent V
            _, tv = latents[i]
            out_caches.append({"k": filled[i]["k"],
                               "tv": padded(tv, cache["tv"])})
        else:
            out_caches.append(filled[i])
    return logits, out_caches


@functools.partial(jax.jit, static_argnames=("spec",))
def _prefill_latents_only(params, spec, ids):
    """Single-pass prefill for fully-latent models: returns (last-position
    logits, per-layer (tk, tv) latents)."""
    latents, hidden = _forward_capture_latents(params, spec, ids)
    logits = apply_lm_head(params, spec, hidden[:, -1:, :])[:, 0]
    return logits, latents


@functools.partial(jax.jit, static_argnames=("spec",))
def _attention_input_latents(params, spec, ids):
    """Per-layer (tk, tv) latents for low-rank k/v layers over a full
    sequence (used by mixed dense/latent prefill)."""
    latents, _ = _forward_capture_latents(params, spec, ids)
    return latents


def _forward_capture_latents(params, spec, ids):
    """Forward pass that records each latent layer's (tk, tv) and returns
    (latents, final hidden states)."""
    emb = params["embed_tokens"]
    x = emb[ids]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:  # OPT-350m style
        x = _apply_leaf(params["project_in"], x)
    S = ids.shape[1]
    positions = jnp.arange(S)
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][positions + spec.pos_offset]
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
    from asvd4llm_tpu.models.decoder import _causal_mask, _layer_with_names
    latents = []
    for i, layer in enumerate(params["layers"]):
        if layer_uses_latent_v(layer):
            h = apply_norm(spec, layer["ln1"], x) if spec.family != "opt" or \
                spec.do_layer_norm_before else x
            tk = _latent(layer["k_proj"], h) \
                if is_lowrank(layer["k_proj"]) else None
            latents.append((tk, _latent(layer["v_proj"], h)))
        else:
            latents.append(None)
        mask = _causal_mask(spec, i, positions, positions, None)
        x, _ = _layer_with_names(spec, layer, x, i, cos, sin, mask,
                                 stats=None, collect=None, use_pallas=False,
                                 cache=None, cache_pos=0)
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = _apply_leaf(params["project_out"], x)
    return latents, x


@functools.partial(jax.jit, static_argnames=("spec", "max_new_tokens",
                                              "eos_token_id", "use_pallas"))
def _decode_while(params, spec, token0, caches, start_pos, max_new_tokens,
                  eos_token_id, use_pallas=False):
    """On-device greedy decode: ONE dispatch for the whole generation via
    lax.while_loop with EOS early exit — no per-token host round trip
    (the host loop costs one tunnel RTT per token on TPU). Token-identical
    to the host loop in generate(): finished rows keep greedy-decoding
    (their later tokens are emitted exactly like the host loop emits them)
    and the loop exits once every row has produced EOS.

    Returns (tokens [B, max_new_tokens] int32, n_steps) where tokens[:, i]
    for i < n_steps are the valid emissions."""
    B = token0.shape[0]
    out0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    fin0 = jnp.zeros((B,), bool)

    def cond(state):
        step, _, _, _, finished = state
        return (step < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        step, token, caches, out, finished = state
        out = jax.lax.dynamic_update_slice(out, token.astype(jnp.int32),
                                           (0, step))
        if eos_token_id is not None:
            finished = finished | (token[:, 0] == eos_token_id)
        logits, caches = decode_step(params, spec, token, caches,
                                     start_pos + step,
                                     use_pallas=use_pallas)
        token = jnp.argmax(logits, axis=-1)[:, None].astype(token.dtype)
        return step + 1, token, caches, out, finished

    step, _, _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), token0, caches, out0, fin0))
    return out, step


def generate_on_device(params, spec, input_ids, *, max_new_tokens: int = 32,
                       eos_token_id: Optional[int] = None,
                       max_len: Optional[int] = None, latent_kv: bool = False,
                       use_pallas: bool = False, dtype=None) -> np.ndarray:
    """Greedy generation with the whole decode loop on device
    (lax.while_loop); output-identical to generate()."""
    ids = jnp.asarray(np.asarray(input_ids))
    B, S = ids.shape
    total = max_len or (S + max_new_tokens)
    dtype = dtype or params["embed_tokens"].dtype
    caches = init_caches(params, spec, B, total, dtype, latent=latent_kv)
    logits, caches = prefill_host(params, spec, ids, caches, latent=latent_kv)
    token = jnp.argmax(logits, axis=-1)[:, None].astype(ids.dtype)
    out, n_steps = _decode_while(params, spec, token, caches, S,
                                 max_new_tokens, eos_token_id,
                                 use_pallas=use_pallas)
    n = int(n_steps)
    return np.concatenate([np.asarray(ids), np.asarray(out)[:, :n]], axis=1)


def generate_auto(params, spec, input_ids, **kw) -> np.ndarray:
    """Greedy generation via the on-device while-loop on TPU (one dispatch
    for the whole decode — the host loop pays one tunnel round-trip per
    token there) and the host loop elsewhere; both are token-identical."""
    if jax.default_backend() == "tpu":
        return generate_on_device(params, spec, input_ids, **kw)
    return generate(params, spec, input_ids, **kw)


def generate(params, spec, input_ids, *, max_new_tokens: int = 32,
             eos_token_id: Optional[int] = None, max_len: Optional[int] = None,
             latent_kv: bool = False, use_pallas: bool = False,
             dtype=None) -> np.ndarray:
    """Greedy generation. input_ids: [B, S] -> [B, S + new]."""
    ids = jnp.asarray(np.asarray(input_ids))
    B, S = ids.shape
    total = max_len or (S + max_new_tokens)
    dtype = dtype or params["embed_tokens"].dtype
    caches = init_caches(params, spec, B, total, dtype, latent=latent_kv)

    logits, caches = prefill_host(params, spec, ids, caches, latent=latent_kv)
    out = [np.asarray(ids)]
    token = jnp.argmax(logits, axis=-1)[:, None].astype(ids.dtype)
    finished = np.zeros((B,), bool)
    for step in range(max_new_tokens):
        out.append(np.asarray(token))
        if eos_token_id is not None:
            finished |= (np.asarray(token)[:, 0] == eos_token_id)
            if finished.all():
                break
        if step == max_new_tokens - 1:
            break
        logits, caches = decode_step(params, spec, token, caches,
                                     S + step, use_pallas=use_pallas)
        token = jnp.argmax(logits, axis=-1)[:, None].astype(ids.dtype)
    return np.concatenate(out, axis=1)
