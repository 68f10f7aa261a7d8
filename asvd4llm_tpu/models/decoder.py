"""One functional decoder covering OPT / Llama / Gemma-2 families.

Pure function of (params pytree, input_ids, spec): no module tree, no
hooks, no in-place mutation. The three capabilities the reference gets
from torch modules are reproduced functionally:

- hook-based activation statistics (ref act_aware_utils.py:62-81) become
  an optional stats output of the same forward (``forward_with_stats``);
- nn.Linear swap-in/out (ref sensitivity.py:53,59) becomes functional
  leaf substitution (registry.set_linear);
- the body/head split used by the windowed PPL evaluator
  (ref evaluate_utils.py:163-167) is ``forward_hidden`` + ``apply_lm_head``.

Everything is jit-compatible with static shapes; the per-layer loop is a
Python loop so heterogeneous (dense | low-rank) layer structures trace
naturally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from asvd4llm_tpu.models.registry import (
    is_lowrank, layer_linear_keys, linear_name,
)
from asvd4llm_tpu.ops.lowrank import dense_apply, lowrank_apply


# ---------------------------------------------------------------- norms ---

def rms_norm(x, w, eps, unit_offset=False):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    scale = (1.0 + w.astype(jnp.float32)) if unit_offset else w.astype(jnp.float32)
    return (xf * scale).astype(x.dtype)


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def apply_norm(spec, norm_params, x):
    if spec.norm == "rmsnorm":
        return rms_norm(x, norm_params["w"], spec.norm_eps,
                        unit_offset=spec.rmsnorm_unit_offset)
    return layer_norm(x, norm_params["w"], norm_params["b"], spec.norm_eps)


# ----------------------------------------------------------------- rope ---

def rope_cos_sin(positions, head_dim, theta, dtype=jnp.float32):
    """positions: [S] int -> cos/sin [S, head_dim] (llama 'rotate half' layout)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x, cos, sin):
    """x: [B, S, H, hd]; cos/sin: [S, hd]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


# -------------------------------------------------------------- linears ---

def apply_linear(leaf, x, *, name=None, stats=None, collect=None,
                 use_pallas=False):
    """Apply a dense or low-rank linear leaf; optionally accumulate
    calibration statistics of the INPUT (ref act_aware_utils.py:64-74)."""
    if stats is not None and collect is not None and name is not None:
        absx = jnp.abs(x.astype(jnp.float32))
        flat = absx.reshape(-1, absx.shape[-1]) if absx.ndim == 2 else absx
        if collect == "abs_mean":
            # per-batch-entry mean over seq, summed over entries (ref :65-67)
            contrib = flat.mean(axis=-2)
            contrib = contrib.sum(axis=0) if contrib.ndim == 2 else contrib
            prev = stats.get(name)
            stats[name] = contrib if prev is None else prev + contrib
        elif collect == "abs_max":
            contrib = flat.max(axis=tuple(range(flat.ndim - 1)))
            prev = stats.get(name)
            stats[name] = contrib if prev is None else jnp.maximum(prev, contrib)
        else:
            raise ValueError(f"unknown stats method {collect!r}")
    if "A4" in leaf:  # int4-packed factors (deployment format)
        from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply_q4
        group = leaf["B4"].shape[1] * 2 // leaf["Bsc"].shape[1]
        return fused_lowrank_apply_q4(x, leaf["A4"], leaf["Asc"],
                                      leaf["Azs"], leaf["B4"], leaf["Bsc"],
                                      leaf["Bzs"], leaf["b"], group=group)
    if "A8" in leaf:  # int8-quantized factors (deployment format)
        from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply_q8
        from asvd4llm_tpu.ops.quant import QuantParams
        a_qp = QuantParams(leaf["Asc"], leaf["Azp"], 255)
        b_qp = QuantParams(leaf["Bsc"], leaf["Bzp"], 255)
        return fused_lowrank_apply_q8(x, leaf["A8"], a_qp, leaf["B8"], b_qp,
                                      leaf["b"])
    if is_lowrank(leaf):
        return lowrank_apply(x, leaf["A"], leaf["B"], leaf["b"],
                             use_pallas=use_pallas)
    return dense_apply(x, leaf["w"], leaf["b"])


def _activation(spec, x):
    if spec.act == "silu":
        return jax.nn.silu(x)
    if spec.act == "relu":
        return jax.nn.relu(x)
    if spec.act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if spec.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {spec.act!r}")


def _softcap(x, cap):
    return cap * jnp.tanh(x / cap)


# ------------------------------------------------------------ attention ---

def attn_precision(dtype):
    """Per-operand-dtype attention-dot precision.

    f32 attention dots run at TRUE f32: jax's default matmul precision
    executes f32 contractions in reduced (bf16-class) precision on both TPU
    and the oneDNN CPU backend — measured ~1e-2 logit noise, enough to flip
    greedy tokens and blur eval parity. bf16 operands take DEFAULT: the
    MXU's native bf16×bf16→f32 path is already exact for bf16 inputs, and
    pinning HIGHEST on them invites an upcast-and-multipass lowering."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _attention(spec, layer, x, layer_idx, cos, sin, mask, *, la, cache=None,
               cache_pos=0):
    """Multi-head attention with GQA, RoPE/none, optional logit softcap,
    optional KV cache (dense K/V; the latent low-rank cache lives in
    eval/generate.py). Returns (output, new_cache_entry)."""
    B, S, _ = x.shape
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim

    q = la(layer["q_proj"], x).reshape(B, S, H, hd)
    k = la(layer["k_proj"], x).reshape(B, S, KV, hd)
    v = la(layer["v_proj"], x).reshape(B, S, KV, hd)

    if spec.pos_emb == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    new_entry = None
    if cache is not None:
        k_cache, v_cache = cache  # [B, T, KV, hd]
        k = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                         (0, cache_pos, 0, 0))
        v = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                         (0, cache_pos, 0, 0))
        new_entry = (k, v)

    # GQA contracts grouped query heads [B, S, KV, rep, hd] against the raw
    # K/V (HF repeat_interleave head order) — never materializing the
    # rep-times-repeated K/V that jnp.repeat would write to HBM
    rep = H // KV
    scale = spec.attn_scale if spec.attn_scale is not None else hd ** -0.5
    qg = q.reshape(B, S, KV, rep, hd)
    Sk = k.shape[1]
    if S >= _BLOCK_MIN_SQ and Sk >= 2 * _BLOCK_SIZE:
        out = _attention_blocked(spec, qg, k, v, mask, scale)
    else:
        logits = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k,
                            preferred_element_type=jnp.float32,
                            precision=attn_precision(qg.dtype)) * scale
        if spec.attn_logit_softcap > 0:
            logits = _softcap(logits, spec.attn_logit_softcap)
        logits = logits + mask[:, :, None]  # mask: [1|B, 1, Sq, Sk]
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(v.dtype)
        out = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v,
                         preferred_element_type=jnp.float32,
                         precision=attn_precision(v.dtype)).astype(x.dtype)
        out = out.reshape(B, S, H * hd)
    o_key = "o_proj" if "o_proj" in layer else "out_proj"
    return la(layer[o_key], out), new_entry


# long-prefill attention blocks over keys once the materialized score
# tensor would dominate memory: the unblocked [B, H, Sq, Sk] f32 scores of
# a B=8, S=4096, H=32 prefill are ~17 GB — more than the whole chip
_BLOCK_MIN_SQ = 2049     # eval's 2048-token windows stay on the fast path
_BLOCK_SIZE = 512


def _attention_blocked(spec, qg, k, v, mask, scale):
    """Flash-style blocked attention in XLA: lax.scan over key blocks with
    a running (max, denominator, accumulator) online softmax — peak memory
    O(Sq * block) scores instead of O(Sq * Sk). Numerically equivalent to
    the unblocked softmax path (tested)."""
    B, S, KV, rep, hd = qg.shape
    Sk = k.shape[1]
    C = _BLOCK_SIZE
    nC = -(-Sk // C)
    pad = nC * C - Sk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad)),
                       constant_values=-1e30)
    mask = jnp.broadcast_to(mask, (mask.shape[0], 1, S, nC * C))
    # stack key blocks as scan inputs: [nC, B, C, KV, hd] / mask blocks
    kb = jnp.moveaxis(k.reshape(B, nC, C, KV, hd), 1, 0)
    vb = jnp.moveaxis(v.reshape(B, nC, C, KV, hd), 1, 0)
    mb = jnp.moveaxis(mask.reshape(mask.shape[0], 1, S, nC, C), 3, 0)

    m0 = jnp.full((B, KV, rep, S), -1e30, jnp.float32)
    l0 = jnp.zeros((B, KV, rep, S), jnp.float32)
    a0 = jnp.zeros((B, KV, rep, S, hd), jnp.float32)

    def body(carry, blk):
        m, l, acc = carry
        kb, vb, mb = blk
        logits = jnp.einsum("bqgrd,bcgd->bgrqc", qg, kb,
                            preferred_element_type=jnp.float32,
                            precision=attn_precision(qg.dtype)) * scale
        if spec.attn_logit_softcap > 0:
            logits = _softcap(logits, spec.attn_logit_softcap)
        logits = logits + mb[:, :, None]          # [B, g, r, S, C]
        m_new = jnp.maximum(m, logits.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bgrqc,bcgd->bgrqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32,
            precision=attn_precision(vb.dtype))
        return (m_new, l, acc), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), (kb, vb, mb))
    out = (acc / l[..., None]).astype(qg.dtype)   # [B, g, r, S, hd]
    return jnp.moveaxis(out, 3, 1).reshape(B, S, KV * rep * hd)


def _causal_mask(spec, layer_idx, q_pos, k_pos, pad_mask=None):
    """Additive mask [1|B, 1, Sq, Sk]: causal, optional sliding window,
    optional padding mask [B, Sk]."""
    neg = jnp.float32(-1e30)
    allow = k_pos[None, :] <= q_pos[:, None]
    if spec.layer_uses_sliding(layer_idx):
        allow &= k_pos[None, :] > (q_pos[:, None] - spec.sliding_window)
    m = jnp.where(allow, 0.0, neg)[None, None, :, :]
    if pad_mask is not None:
        pm = jnp.where(pad_mask.astype(bool), 0.0, neg)[:, None, None, :]
        m = m + pm
    return m


# ------------------------------------------------------------- layers ----

def _decoder_layer(spec, layer, x, layer_idx, cos, sin, mask, *, la,
                   cache=None, cache_pos=0):
    if spec.family == "opt":
        return _opt_layer(spec, layer, x, layer_idx, cos, sin, mask, la=la,
                          cache=cache, cache_pos=cache_pos)

    residual = x
    h = apply_norm(spec, layer["ln1"], x)
    attn_out, new_entry = _attention(spec, layer, h, layer_idx, cos, sin,
                                     mask, la=la, cache=cache,
                                     cache_pos=cache_pos)
    if spec.post_attn_out_norm:  # gemma2
        attn_out = apply_norm(spec, layer["ln1_post"], attn_out)
    x = residual + attn_out

    residual = x
    h = apply_norm(spec, layer["ln2"], x)
    if spec.mlp == "gated":
        gate = _activation(spec, la(layer["gate_proj"], h))
        up = la(layer["up_proj"], h)
        mlp_out = la(layer["down_proj"], gate * up)
    else:
        mlp_out = la(layer["fc2"], _activation(spec, la(layer["fc1"], h)))
    if spec.post_mlp_out_norm:  # gemma2
        mlp_out = apply_norm(spec, layer["ln2_post"], mlp_out)
    return residual + mlp_out, new_entry


def _opt_layer(spec, layer, x, layer_idx, cos, sin, mask, *, la,
               cache=None, cache_pos=0):
    """OPT decoder layer (pre-norm when do_layer_norm_before, else post)."""
    residual = x
    h = apply_norm(spec, layer["ln1"], x) if spec.do_layer_norm_before else x
    attn_out, new_entry = _attention(spec, layer, h, layer_idx, cos, sin,
                                     mask, la=la, cache=cache,
                                     cache_pos=cache_pos)
    x = residual + attn_out
    if not spec.do_layer_norm_before:
        x = apply_norm(spec, layer["ln1"], x)

    residual = x
    h = apply_norm(spec, layer["ln2"], x) if spec.do_layer_norm_before else x
    h = la(layer["fc2"], _activation(spec, la(layer["fc1"], h)))
    x = residual + h
    if not spec.do_layer_norm_before:
        x = apply_norm(spec, layer["ln2"], x)
    return x, new_entry


# ------------------------------------------------------------- forward ---

def forward_hidden(params, input_ids, spec, *, positions=None, pad_mask=None,
                   stats=None, collect=None, use_pallas=False, caches=None,
                   cache_pos=0, remat=False):
    """Embeddings + all decoder layers + final norm -> hidden states
    [B, S, hidden]. (= reference's ``lm.model.model(batch)``,
    evaluate_utils.py:163.)

    caches: optional list of per-layer (k_cache, v_cache) for decode;
    returns (hidden, new_caches).
    """
    B, S = input_ids.shape
    emb = params["embed_tokens"]
    x = emb[input_ids]
    if spec.embed_scale != 1.0:
        # gemma casts the normalizer to the embedding dtype first
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:
        # OPT-350m: word_embed_proj_dim -> hidden before positions
        x = apply_linear(params["project_in"], x,
                         name="model.decoder.project_in",
                         stats=stats, collect=collect, use_pallas=use_pallas)

    if positions is None:
        positions = jnp.arange(S, dtype=jnp.int32) + cache_pos
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][positions + spec.pos_offset]
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)

    kv_len = caches[0][0].shape[1] if caches is not None else S
    k_pos = jnp.arange(kv_len, dtype=jnp.int32)

    new_caches = [] if caches is not None else None
    for i, layer in enumerate(params["layers"]):
        mask = _causal_mask(spec, i, positions, k_pos, pad_mask)
        # bind per-linear names for stats collection
        if remat and caches is None and stats is None:
            # rematerialize per layer on the backward pass (Fisher of big
            # models: trade recompute for activation memory, SURVEY §7.3)
            def layer_fn(layer, x, mask, i=i):
                out, _ = _layer_with_names(spec, layer, x, i, cos, sin, mask,
                                           stats=None, collect=None,
                                           use_pallas=use_pallas,
                                           cache=None, cache_pos=cache_pos)
                return out
            x = jax.checkpoint(layer_fn)(layer, x, mask)
            entry = None
        else:
            x, entry = _layer_with_names(spec, layer, x, i, cos, sin, mask,
                                         stats=stats, collect=collect,
                                         use_pallas=use_pallas,
                                         cache=None if caches is None else caches[i],
                                         cache_pos=cache_pos)
        if new_caches is not None:
            new_caches.append(entry)

    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = apply_linear(params["project_out"], x,
                         name="model.decoder.project_out",
                         stats=stats, collect=collect, use_pallas=use_pallas)
    return x, new_caches


def _layer_with_names(spec, layer, x, layer_idx, cos, sin, mask, *, stats,
                      collect, use_pallas, cache, cache_pos):
    def la(leaf, h):
        # find this leaf's key for the stats name
        name = None
        if stats is not None and collect is not None:
            for k in layer_linear_keys(spec):
                if layer[k] is leaf:
                    name = linear_name(spec, layer_idx, k)
                    break
        return apply_linear(leaf, h, name=name, stats=stats, collect=collect,
                            use_pallas=use_pallas)
    return _decoder_layer(spec, layer, x, layer_idx, cos, sin, mask, la=la,
                          cache=cache, cache_pos=cache_pos)


def apply_lm_head(params, spec, hidden, *, stats=None, collect=None):
    """hidden [B, S, H] -> logits [B, S, V] float32
    (= reference's ``lm.model.lm_head(hidden)``, evaluate_utils.py:167).

    An explicit lm_head leaf (dense / low-rank / q8) always wins over the
    tied-embedding path — compressing a tied head materializes such a leaf
    (registry.set_linear), mirroring the reference's SVDLinear swap-in."""
    if params.get("lm_head") is not None:
        logits = apply_linear(params["lm_head"], hidden, name="lm_head",
                              stats=stats, collect=collect
                              ).astype(jnp.float32)
    else:
        if stats is not None and collect is not None:
            # tied head: the reference's hook still fires on lm_head input
            apply_linear({"w": params["embed_tokens"], "b": None}, hidden,
                         name="lm_head", stats=stats, collect=collect)
        w = params["embed_tokens"]
        logits = jax.lax.dot_general(
            hidden, w, (((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32)
    if spec.final_logit_softcap > 0:
        logits = _softcap(logits, spec.final_logit_softcap)
    return logits


def forward(params, input_ids, spec, *, positions=None, pad_mask=None,
            use_pallas=False, caches=None, cache_pos=0):
    """Full forward -> logits [B, S, vocab] float32."""
    hidden, new_caches = forward_hidden(
        params, input_ids, spec, positions=positions, pad_mask=pad_mask,
        use_pallas=use_pallas, caches=caches, cache_pos=cache_pos)
    logits = apply_lm_head(params, spec, hidden)
    if caches is not None:
        return logits, new_caches
    return logits


def forward_with_stats(params, input_ids, spec, *, collect="abs_mean",
                       pad_mask=None):
    """Forward that also returns per-linear input statistics
    {full_name: [in_features]} — the functional replacement for the
    reference's forward hooks (ref act_aware_utils.py:62-81)."""
    stats: dict = {}
    hidden, _ = forward_hidden(params, input_ids, spec, pad_mask=pad_mask,
                               stats=stats, collect=collect)
    logits = apply_lm_head(params, spec, hidden, stats=stats, collect=collect)
    return logits, stats
