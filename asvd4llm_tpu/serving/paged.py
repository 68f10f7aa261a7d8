"""Paged low-rank KV cache (BASELINE.json north star: "paged low-rank KV
layout").

The flat caches in eval/generate.py preallocate [B, max_len, ...] per
sequence — fine for lockstep eval, wasteful for serving mixed-length
requests. Here cache memory is a POOL of fixed-size pages shared by all
sequences (the vLLM PagedAttention layout, expressed TPU-first):

  pool      [num_pages, page, ...]   one array per layer per cache kind
  page_table[B, max_pages] int32     logical page p of sequence b -> pool id
  positions [B] int32                per-sequence decode position (ragged!)

All three cache layouts page identically: dense {k, v}, latent {tk, tv}
(rank-dim latents, REALIZED KV compression), and latent-V-only {k, tv}.
Page 0 is a reserved scratch page: inactive batch rows point every logical
page at it, so their (masked, ignored) writes never touch live data.

Reads gather pages into the [B, T, ...] view XLA fuses into the attention
contraction; writes are one scatter per layer per step at
(page_table[b, pos_b // page], pos_b % page). Attention itself reuses the
grouped-GQA helpers from eval/generate.py with a per-sequence [B, T] mask —
positions are ragged, which is the point of paging (continuous batching
lives in serving/engine.py).

The reference has no serving stack at all — its KV story is rank
accounting only (ref binary_search.py:94-96, SURVEY §3.3/§5.7); this
realizes it at serving granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from asvd4llm_tpu.eval.generate import (
    _absorbed_v_out, _apply_leaf, _decode_layer, _gqa_probs, _latent, _up_k,
    init_caches, layer_uses_latent_kv, layer_uses_latent_v, prefill_host,
)
from asvd4llm_tpu.models.decoder import (
    apply_lm_head, apply_norm, apply_rope, attn_precision, rope_cos_sin,
)


def pages_needed(n_tokens: int, page_size: int) -> int:
    return -(-n_tokens // page_size)


def default_page_size(kv_heads: int, head_dim: int, itemsize: int = 2, *,
                      target_bytes: int = 2 << 20, lo: int = 64,
                      hi: int = 2048) -> int:
    """Geometry-aware page size: size pages by BYTES, not tokens.

    The paged decode kernel's per-page-iteration fixed costs (grid
    dispatch, online-softmax VPU work over [H, P], scalar-prefetch table
    resolution) do not shrink with kv_heads, but the bytes a page carries
    do (P * KV * hd * itemsize). A token-count default therefore makes
    GQA overhead-bound: at P=256/hd=128 an MHA32 K-page is 2 MB while a
    gqa8 page is 512 KB — the measured r4 result (paged gqa8 0.87x flat
    dense vs MHA 1.17-1.29x, attn_micro_r4c.json) is that 4x amortization
    loss. Holding the K-page at ~2 MB instead keeps the DMA long enough
    to hide the fixed costs at every geometry: 256 tokens for MHA32,
    1024 for gqa8 (hd=128, bf16). Power-of-2, clamped to [lo, hi]."""
    raw = target_bytes // max(1, kv_heads * head_dim * itemsize)
    p = lo
    while p * 2 <= raw and p * 2 <= hi:
        p *= 2
    return p


def init_paged_pools(params, spec, num_pages: int, page_size: int,
                     dtype=jnp.bfloat16, *, latent=False) -> list:
    """Per-layer page pools; layout mirrors eval.generate.init_caches with
    the leading [B, max_len] replaced by [num_pages, page_size]."""
    flat = init_caches(params, spec, num_pages, page_size, dtype,
                       latent=latent)
    # init_caches builds [num_pages, page_size, ...] directly when batch is
    # interpreted as the page axis — shapes are identical.
    return flat


def _flat_view(pool_arr, page_table):
    """pool [NP, P, ...] + page_table [B, MP] -> [B, MP*P, ...] gather."""
    g = pool_arr[page_table]                      # [B, MP, P, ...]
    B, MP, P = g.shape[0], g.shape[1], g.shape[2]
    return g.reshape(B, MP * P, *pool_arr.shape[2:])


def _scatter_token(pool_arr, page_table, positions, val):
    """Write one token's value per sequence: val [B, ...] lands at
    (page_table[b, pos_b // P], pos_b % P)."""
    P = pool_arr.shape[1]
    pages = jnp.take_along_axis(page_table, (positions // P)[:, None],
                                axis=1)[:, 0]                # [B]
    slots = positions % P
    return pool_arr.at[pages, slots].set(val.astype(pool_arr.dtype))


def _rope_one(x, cos_b, sin_b):
    """Per-sequence single-position RoPE: x [B, KV, hd], cos/sin [B, hd]."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos_b[:, None, :].astype(jnp.float32)
    s = sin_b[:, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s
            ).astype(x.dtype)


def _paged_attend(spec, layer, x, cache, positions, cos_full, sin_full,
                  layer_idx, up=False):
    """Paged mirror of eval.generate._attend_step with per-sequence
    positions. cache = {"pools": per-layer pool dict, "pt": page_table}."""
    pools, pt = cache["pools"], cache["pt"]
    B = x.shape[0]
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    P = next(iter(pools.values())).shape[1]
    T = pt.shape[1] * P
    rep = H // KV

    q = _apply_leaf(layer["q_proj"], x, up).reshape(B, 1, H, hd)
    cos_q = cos_full[positions]                   # [B, hd]
    sin_q = sin_full[positions]
    if spec.pos_emb == "rope":
        q = _rope_one(q[:, 0], cos_q, sin_q)[:, None]

    scale = spec.attn_scale if spec.attn_scale is not None else hd ** -0.5
    k_pos = jnp.arange(T)
    allow = k_pos[None, :] <= positions[:, None]  # [B, T] ragged causal
    if spec.layer_uses_sliding(layer_idx):
        allow &= k_pos[None, :] > positions[:, None] - spec.sliding_window
    mask_bt = jnp.where(allow, 0.0, jnp.float32(-1e30))

    if "tk" in pools:  # latent kv
        tk_new = _latent(layer["k_proj"], x)[:, 0]        # [B, Rk]
        tv_new = _latent(layer["v_proj"], x)[:, 0]
        tk_pool = _scatter_token(pools["tk"], pt, positions, tk_new)
        tv_pool = _scatter_token(pools["tv"], pt, positions, tv_new)
        new_pools = {"tk": tk_pool, "tv": tv_pool}

        if up and spec.pos_emb == "rope" and layer["k_proj"]["b"] is None:
            # fused paged flash-decoding: the page table rides as a
            # scalar-prefetch grid index, streaming only owned pages (the
            # gather fallback below copies the whole [B, T] view first)
            from asvd4llm_tpu.ops.pallas_latent_attention import \
                paged_latent_decode_attention
            out = paged_latent_decode_attention(
                q[:, 0], tk_pool, tv_pool, layer["k_proj"]["A"],
                layer["v_proj"]["A"], cos_full[:T], sin_full[:T], pt,
                positions, kv_heads=KV, scale=scale,
                softcap=spec.attn_logit_softcap,
                sliding=spec.sliding_window
                if spec.layer_uses_sliding(layer_idx) else 0,
                v_bias=layer["v_proj"]["b"])
            out = out.astype(x.dtype)[:, None, :]
            o_key = "o_proj" if "o_proj" in layer else "out_proj"
            return _apply_leaf(layer[o_key], out, up), \
                {"pools": new_pools, "pt": pt}

        tk = _flat_view(tk_pool, pt)                      # [B, T, Rk]
        tv = _flat_view(tv_pool, pt)
        k = _up_k(layer["k_proj"], tk, B, T, KV, hd)
        if spec.pos_emb == "rope":
            # logical page positions ARE absolute sequence positions
            k = apply_rope(k, cos_full[:T], sin_full[:T])
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_bt)
        out = _absorbed_v_out(probs, tv, layer["v_proj"], KV, hd, rep,
                              x.dtype)
    elif "tv" in pools:  # dense K + latent V
        k_new = _apply_leaf(layer["k_proj"], x, up).reshape(B, KV, hd)
        tv_new = _latent(layer["v_proj"], x)[:, 0]
        if spec.pos_emb == "rope":
            k_new = _rope_one(k_new, cos_q, sin_q)
        k_pool = _scatter_token(pools["k"], pt, positions, k_new)
        tv_pool = _scatter_token(pools["tv"], pt, positions, tv_new)
        new_pools = {"k": k_pool, "tv": tv_pool}
        if up:
            from asvd4llm_tpu.ops.pallas_latent_attention import \
                paged_dense_decode_attention
            out = paged_dense_decode_attention(
                q[:, 0], k_pool, tv_pool, pt, positions, kv_heads=KV,
                scale=scale, softcap=spec.attn_logit_softcap,
                sliding=spec.sliding_window
                if spec.layer_uses_sliding(layer_idx) else 0,
                a_v=layer["v_proj"]["A"], v_bias=layer["v_proj"]["b"])
            out = out.astype(x.dtype)[:, None, :]
            o_key = "o_proj" if "o_proj" in layer else "out_proj"
            return _apply_leaf(layer[o_key], out, up), \
                {"pools": new_pools, "pt": pt}
        k = _flat_view(k_pool, pt)
        tv = _flat_view(tv_pool, pt)
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_bt)
        out = _absorbed_v_out(probs, tv, layer["v_proj"], KV, hd, rep,
                              x.dtype)
    else:  # dense
        k_new = _apply_leaf(layer["k_proj"], x, up).reshape(B, KV, hd)
        v_new = _apply_leaf(layer["v_proj"], x, up).reshape(B, KV, hd)
        if spec.pos_emb == "rope":
            k_new = _rope_one(k_new, cos_q, sin_q)
        k_pool = _scatter_token(pools["k"], pt, positions, k_new)
        v_pool = _scatter_token(pools["v"], pt, positions, v_new)
        new_pools = {"k": k_pool, "v": v_pool}
        if up:
            # fused dense paged flash-decoding: no [B, T] gather copy (at
            # 7B dims the gather temp alone OOMs a 16G chip)
            from asvd4llm_tpu.ops.pallas_latent_attention import \
                paged_dense_decode_attention
            out = paged_dense_decode_attention(
                q[:, 0], k_pool, v_pool, pt, positions, kv_heads=KV,
                scale=scale, softcap=spec.attn_logit_softcap,
                sliding=spec.sliding_window
                if spec.layer_uses_sliding(layer_idx) else 0)
            out = out.astype(x.dtype)[:, None, :]
            o_key = "o_proj" if "o_proj" in layer else "out_proj"
            return _apply_leaf(layer[o_key], out, up), \
                {"pools": new_pools, "pt": pt}
        k = _flat_view(k_pool, pt)
        v = _flat_view(v_pool, pt)
        probs = _gqa_probs(q[:, 0], k, rep, scale, spec.attn_logit_softcap,
                           mask_bt)
        out = jnp.einsum("bgrk,bkgd->bgrd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32,
                         precision=attn_precision(v.dtype))
        out = out.astype(x.dtype).reshape(B, 1, H * hd)

    o_key = "o_proj" if "o_proj" in layer else "out_proj"
    return _apply_leaf(layer[o_key], out, up), {"pools": new_pools, "pt": pt}


@functools.partial(jax.jit, static_argnames=("spec", "use_pallas"))
def paged_decode_step(params, spec, token, pools, page_table, positions,
                      use_pallas=False):
    """One ragged decode step over paged caches.

    token [B, 1]; pools: per-layer pool dicts; page_table [B, MP] int32;
    positions [B] int32 (per-sequence slot for THIS token — ragged).
    Returns (logits [B, vocab], new pools)."""
    emb = params["embed_tokens"]
    x = emb[token]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:
        x = _apply_leaf(params["project_in"], x)
    P = next(iter(pools[0].values())).shape[1]
    T = page_table.shape[1] * P
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][positions + spec.pos_offset][:, None]
        cos_full = sin_full = jnp.zeros((T, spec.head_dim))
    else:
        cos_full, sin_full = rope_cos_sin(jnp.arange(T), spec.head_dim,
                                          spec.rope_theta)
    new_pools = []
    for i, layer in enumerate(params["layers"]):
        x, c = _decode_layer(spec, layer, x,
                             {"pools": pools[i], "pt": page_table},
                             positions, cos_full, sin_full, i,
                             up=use_pallas, attend=_paged_attend)
        new_pools.append(c["pools"])
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = _apply_leaf(params["project_out"], x)
    logits = apply_lm_head(params, spec, x)[:, 0]
    return logits, new_pools


def _sample_rows(logits, keys, temperature: float, top_p: float):
    """Temperature/top-p sampling of one token per row, on device.

    logits [B, V] f32; keys [B] PRNG keys. Top-p keeps the smallest
    prefix of descending-probability tokens whose exclusive cumulative
    mass is < top_p (identical to numpy's searchsorted-cut semantics the
    host sampler used), then samples via the Gumbel-argmax trick — no
    renormalization needed. Shared by the engine's host path and the
    multi-step decode scan, so both produce IDENTICAL tokens for the same
    (seed, rid, position)."""
    z = logits.astype(jnp.float32) / temperature
    p = jax.nn.softmax(z, axis=-1)
    order = jnp.argsort(-p, axis=-1)
    ps = jnp.take_along_axis(p, order, axis=-1)
    cexcl = jnp.cumsum(ps, axis=-1) - ps
    keep_sorted = cexcl < top_p
    keep = jnp.zeros_like(keep_sorted)
    keep = jnp.put_along_axis(keep, order, keep_sorted, axis=-1,
                              inplace=False)
    z_masked = jnp.where(keep, z, -jnp.inf)
    g = jax.vmap(lambda k, shape=z.shape[-1:]:
                 jax.random.gumbel(k, shape))(keys)
    return jnp.argmax(z_masked + g, axis=-1).astype(jnp.int32)


def sample_rows_keyed(logits, rids, positions, seed: int,
                      temperature: float, top_p: float):
    """Stateless per-(request, position) sampling keys: the token emitted
    at sequence index q of request rid draws from
    fold_in(fold_in(PRNGKey(seed), rid), q) — both the host stepwise path
    and the fused decode scan derive the same keys, so scheduling choices
    (chunk size, admission order) never change sampled outputs."""
    key0 = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda r, q: jax.random.fold_in(
        jax.random.fold_in(key0, r), q))(rids.astype(jnp.uint32),
                                         positions.astype(jnp.uint32))
    return _sample_rows(logits, keys, temperature, top_p)


sample_rows_keyed_jit = jax.jit(
    sample_rows_keyed, static_argnames=("seed", "temperature", "top_p"))


@functools.partial(jax.jit, static_argnames=("spec", "n_steps", "use_pallas",
                                             "temperature", "top_p", "seed"),
                   donate_argnames=("pools",))
def paged_decode_scan(params, spec, token, pools, page_table, positions,
                      n_steps, use_pallas=False, temperature=0.0,
                      top_p=1.0, seed=0, rids=None):
    """n_steps ragged decode steps in ONE dispatch (lax.scan over
    paged_decode_step). Host round-trips cost ~28 ms each through the TPU
    tunnel; the engine's multi-step scheduling runs admission/retirement
    every n_steps tokens instead of every token. Returns (tokens
    [B, n_steps], new pools) — greedy at temperature 0, position-keyed
    temperature/top-p sampling otherwise (identical tokens to the host
    stepwise sampler). Rows that hit EOS mid-chunk keep decoding (their
    surplus tokens are discarded host-side, exactly like the flat
    on-device while-loop's finished rows)."""
    if rids is None:
        rids = jnp.zeros((token.shape[0],), jnp.int32)

    def body(carry, _):
        tok, pools, pos = carry
        logits, pools = paged_decode_step(params, spec, tok, pools,
                                          page_table, pos,
                                          use_pallas=use_pallas)
        if temperature > 0:
            # this step writes at pos, so the emitted token's sequence
            # index is pos + 1
            nxt = sample_rows_keyed(logits, rids, pos + 1, seed,
                                    temperature, top_p)[:, None]
            nxt = nxt.astype(tok.dtype)
        else:
            nxt = jnp.argmax(logits, axis=-1)[:, None].astype(tok.dtype)
        return (nxt, pools, pos + 1), nxt[:, 0]
    (_, pools, _), toks = jax.lax.scan(
        body, (token, pools, positions), None, length=n_steps)
    return toks.T, pools


def _scatter_segment(pool_arr, page_table, positions, vals):
    """Write C-token segments of B sequences: vals [B, C, ...] land at
    (page_table[b, pos_bc // P], pos_bc % P). Positions past the allocated
    pages resolve to the reserved scratch page 0 (padded tail of the last
    chunk, or whole rows padded into the admission batch) and are never
    read back. Rows own disjoint pages, so only scratch writes collide —
    and scratch is never read meaningfully."""
    P = pool_arr.shape[1]
    pages = jnp.take_along_axis(page_table, positions // P, axis=1)  # [B,C]
    slots = positions % P
    return pool_arr.at[pages, slots].set(vals.astype(pool_arr.dtype))


def _rope_rows(x, cos_bc, sin_bc):
    """Per-row-position RoPE: x [B, C, H, hd]; cos/sin [B, C, hd]."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos_bc[:, :, None, :].astype(jnp.float32)
    s = sin_bc[:, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s
            ).astype(x.dtype)


def _append_attend(spec, layer, x, cache, pos0, cos_full, sin_full,
                   layer_idx, up=False):
    """Multi-token paged append-attention for a BATCH of sequences
    (chunked prefill): x [B, C, hidden], row b at absolute positions
    pos0[b]..pos0[b]+C-1; writes each segment's cache entries into that
    row's pages, then attends each query causally over everything written
    so far. Rows are independent (disjoint page tables) — admission can
    prefill every waiting request's next chunk in ONE dispatch. `up` is
    accepted for _decode_layer compatibility (fused kernels are
    decode-only)."""
    pools, pt = cache["pools"], cache["pt"]       # pt: [B, MP]
    B, C = x.shape[0], x.shape[1]
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    P = next(iter(pools.values())).shape[1]
    T = pt.shape[1] * P
    rep = H // KV
    positions = pos0[:, None] + jnp.arange(C)[None, :]        # [B, C]

    q = _apply_leaf(layer["q_proj"], x, False).reshape(B, C, H, hd)
    cos_c = cos_full[positions]                               # [B, C, hd]
    sin_c = sin_full[positions]
    if spec.pos_emb == "rope":
        q = _rope_rows(q, cos_c, sin_c)

    scale = spec.attn_scale if spec.attn_scale is not None else hd ** -0.5
    k_pos = jnp.arange(T)
    allow = k_pos[None, None, :] <= positions[:, :, None]     # [B, C, T]
    if spec.layer_uses_sliding(layer_idx):
        allow &= k_pos[None, None, :] > \
            positions[:, :, None] - spec.sliding_window
    mask = jnp.where(allow, 0.0, jnp.float32(-1e30))[:, None, None]

    def probs_of(k):
        qg = q.reshape(B, C, KV, rep, hd)
        logits = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k,
                            preferred_element_type=jnp.float32,
                            precision=attn_precision(qg.dtype)) * scale
        if spec.attn_logit_softcap > 0:
            logits = spec.attn_logit_softcap * jnp.tanh(
                logits / spec.attn_logit_softcap)
        # mask [B, 1, 1, C, T] broadcasts over (g, r)
        return jax.nn.softmax(logits + mask, axis=-1)  # [B,g,r,C,T]

    if "tk" in pools:  # latent kv
        tk_new = _latent(layer["k_proj"], x)          # [B, C, Rk]
        tv_new = _latent(layer["v_proj"], x)
        tk_pool = _scatter_segment(pools["tk"], pt, positions, tk_new)
        tv_pool = _scatter_segment(pools["tv"], pt, positions, tv_new)
        new_pools = {"tk": tk_pool, "tv": tv_pool}
        tk = _flat_view(tk_pool, pt)
        tv = _flat_view(tv_pool, pt)
        k = _up_k(layer["k_proj"], tk, B, T, KV, hd)
        if spec.pos_emb == "rope":
            # logical page positions ARE absolute sequence positions
            k = apply_rope(k, cos_full[:T], sin_full[:T])
        probs = probs_of(k)
        s = jnp.einsum("bgrqk,bkv->bgrqv", probs.astype(tv.dtype), tv,
                       preferred_element_type=jnp.float32,
                       precision=attn_precision(tv.dtype))
        a_v = layer["v_proj"]["A"].reshape(KV, hd, -1)
        out = jnp.einsum("bgrqv,gdv->bqgrd", s.astype(a_v.dtype), a_v,
                         preferred_element_type=jnp.float32,
                         precision=attn_precision(a_v.dtype))
        if layer["v_proj"]["b"] is not None:
            vb = layer["v_proj"]["b"].reshape(KV, hd).astype(jnp.float32)
            out = out + vb[None, None, :, None, :]
        out = out.astype(x.dtype).reshape(B, C, H * hd)
    else:
        k_new = _apply_leaf(layer["k_proj"], x, False).reshape(B, C, KV, hd)
        if spec.pos_emb == "rope":
            k_new = _rope_rows(k_new, cos_c, sin_c)
        k_pool = _scatter_segment(pools["k"], pt, positions, k_new)
        if "tv" in pools:  # dense K + latent V
            tv_new = _latent(layer["v_proj"], x)
            tv_pool = _scatter_segment(pools["tv"], pt, positions, tv_new)
            new_pools = {"k": k_pool, "tv": tv_pool}
            tv = _flat_view(tv_pool, pt)
            probs = probs_of(_flat_view(k_pool, pt))
            s = jnp.einsum("bgrqk,bkv->bgrqv", probs.astype(tv.dtype), tv,
                           preferred_element_type=jnp.float32,
                           precision=attn_precision(tv.dtype))
            a_v = layer["v_proj"]["A"].reshape(KV, hd, -1)
            out = jnp.einsum("bgrqv,gdv->bqgrd", s.astype(a_v.dtype), a_v,
                             preferred_element_type=jnp.float32,
                             precision=attn_precision(a_v.dtype))
            if layer["v_proj"]["b"] is not None:
                vb = layer["v_proj"]["b"].reshape(KV, hd
                                                  ).astype(jnp.float32)
                out = out + vb[None, None, :, None, :]
            out = out.astype(x.dtype).reshape(B, C, H * hd)
        else:  # dense
            v_new = _apply_leaf(layer["v_proj"], x, False
                                ).reshape(B, C, KV, hd)
            v_pool = _scatter_segment(pools["v"], pt, positions, v_new)
            new_pools = {"k": k_pool, "v": v_pool}
            v = _flat_view(v_pool, pt)
            probs = probs_of(_flat_view(k_pool, pt))
            out = jnp.einsum("bgrqk,bkgd->bqgrd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32,
                             precision=attn_precision(v.dtype))
            out = out.astype(x.dtype).reshape(B, C, H * hd)

    o_key = "o_proj" if "o_proj" in layer else "out_proj"
    return _apply_leaf(layer[o_key], out, False), \
        {"pools": new_pools, "pt": pt}


def _append_hidden(params, spec, ids, pools, page_table, pos0):
    """Shared body of the batched paged append: write every row's C-token
    segment into its pages and return the final hidden states
    ([B, C, hidden], new pools) — the lm_head is applied by the wrappers
    (on everything, or on gathered rows only)."""
    x = params["embed_tokens"][ids]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:
        x = _apply_leaf(params["project_in"], x)
    P = next(iter(pools[0].values())).shape[1]
    T = page_table.shape[1] * P
    C = ids.shape[1]
    if spec.pos_emb == "learned":
        positions = pos0[:, None] + jnp.arange(C)[None, :]
        x = x + params["embed_positions"][positions + spec.pos_offset]
        cos_full = sin_full = jnp.zeros((T, spec.head_dim))
    else:
        cos_full, sin_full = rope_cos_sin(jnp.arange(T), spec.head_dim,
                                          spec.rope_theta)
    new_pools = []
    for i, layer in enumerate(params["layers"]):
        x, c = _decode_layer(spec, layer, x,
                             {"pools": pools[i], "pt": page_table},
                             pos0, cos_full, sin_full, i,
                             up=False, attend=_append_attend)
        new_pools.append(c["pools"])
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = _apply_leaf(params["project_out"], x)
    return x, new_pools


@functools.partial(jax.jit, static_argnames=("spec",))
def paged_append_batch(params, spec, ids, pools, page_table, pos0):
    """Append C-token segments of B sequences to their paged caches in ONE
    dispatch and return (logits [B, C, vocab], new pools).

    ids [B, C]; page_table [B, MP] (rows of padded/inactive requests all
    zeros -> scratch); pos0 [B] per-row absolute start positions.

    The chunked-prefill building block: admission processes every waiting
    prompt's next segment together, so serving compiles ONE append program
    (shapes fixed by (B, C, row width)) instead of one prefill per novel
    prompt length — and decode chunks interleave between segment
    dispatches instead of stalling behind whole prompts."""
    x, new_pools = _append_hidden(params, spec, ids, pools, page_table,
                                  pos0)
    return apply_lm_head(params, spec, x), new_pools


@functools.partial(jax.jit, static_argnames=("spec",),
                   donate_argnames=("pools",))
def paged_append_batch_select(params, spec, ids, pools, page_table, pos0,
                              rows, cols):
    """paged_append_batch, but the lm_head runs ONLY on the gathered
    (rows[i], cols[i]) hidden states — returns (logits [K, vocab], pools).

    The engine's admission tick needs next-token logits only for requests
    whose prompt COMPLETES in this segment (usually none). The full-head
    wrapper computes and materializes [B, C, vocab] logits every tick
    (B=8, C=256 at 7B dims: a ~2-TFLOP head GEMM plus a 0.5-GB logits
    buffer, fetched at ~262 MB to the host over the axon tunnel when any
    request finishes). Gathering first makes the tick's head cost
    O(K·hidden·vocab) with a [K, vocab] fetch. Padded entries of
    rows/cols gather (0, 0) and are ignored host-side."""
    x, new_pools = _append_hidden(params, spec, ids, pools, page_table,
                                  pos0)
    h = x[rows, cols]                             # [K, hidden]
    logits = apply_lm_head(params, spec, h[:, None])[:, 0]
    return logits, new_pools


def paged_append(params, spec, ids, pools, page_table_row, pos0):
    """Single-sequence wrapper over paged_append_batch: ids [1, C] +
    page_table_row [MP] -> (logits [C, vocab], new pools)."""
    logits, new_pools = paged_append_batch(
        params, spec, jnp.asarray(ids), pools,
        jnp.asarray(page_table_row, jnp.int32)[None, :],
        jnp.asarray(pos0, jnp.int32)[None])
    return logits[0], new_pools


def prefill_chunked_into_pages(params, spec, ids, pools, page_table_row,
                               chunk: int):
    """Chunked-prefill admission: process ids [1, S] in `chunk`-token
    segments via paged_append — ONE compiled program (shapes fixed by
    (chunk, row width)) reused across segments AND requests, instead of a
    fresh prefill compile per novel prompt length. The last segment is
    padded; padded positions scatter to the reserved scratch page or to
    slots that decode overwrites before reading. page_table_row: int32
    [max_pages] with this sequence's pages set (0 elsewhere). Returns
    (last-real-position logits [1, vocab], new pools)."""
    S = ids.shape[1]
    row = jnp.asarray(page_table_row, jnp.int32)
    arr = jnp.asarray(ids)
    logits = None
    last_in_segment = (S - 1) % chunk
    for c0 in range(0, S, chunk):
        seg = arr[:, c0:c0 + chunk]
        if seg.shape[1] < chunk:
            seg = jnp.pad(seg, ((0, 0), (0, chunk - seg.shape[1])))
        logits_seg, pools = paged_append(params, spec, seg, pools, row, c0)
        logits = logits_seg
    return logits[last_in_segment][None], pools


def _pool_mode(pools) -> object:
    if "tk" in pools[0]:
        return True
    if "tv" in pools[0]:
        return "v"
    return False


def prefill_into_pages(params, spec, ids, pools, page_ids):
    """Prefill ONE sequence (ids [1, S]) and write its cache into the
    allocated pages. page_ids: int sequence of >= ceil(S/P) pool pages.
    Returns (last-position logits [1, vocab], new pools)."""
    S = ids.shape[1]
    P = next(iter(pools[0].values())).shape[1]
    n = pages_needed(S, P)
    assert len(page_ids) >= n, (len(page_ids), n)
    latent = _pool_mode(pools)
    dtype = next(iter(pools[0].values())).dtype
    flat = init_caches(params, spec, 1, n * P, dtype, latent=latent)
    logits, filled = prefill_host(params, spec, ids, flat, latent=latent)
    pages = jnp.asarray(list(page_ids[:n]), jnp.int32)
    out_pools = []
    for pool, cache in zip(pools, filled):
        new = {}
        for key, arr in pool.items():
            vals = cache[key][0].reshape(n, P, *arr.shape[2:])
            new[key] = arr.at[pages].set(vals.astype(arr.dtype))
        out_pools.append(new)
    return logits, out_pools
