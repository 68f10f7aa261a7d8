"""Scan-over-stacked-layers forward: O(1)-in-depth compile time.

The default forward unrolls the layer loop in python — correct for
heterogeneous (mixed dense/low-rank) models, but the compiled program
grows with depth, and compiles through this environment's TPU tunnel cost
minutes. For HOMOGENEOUS all-dense models (the state during calibration,
sensitivity baselines, and raw-model evaluation — the expensive phases),
layers can be stacked into leading-axis arrays and driven by one
``lax.scan``: the program contains ONE layer body regardless of depth.

Per-layer sliding-window alternation (gemma-2) is handled by scanning a
per-layer boolean alongside the weights and selecting between the global
and sliding masks inside the body, so the scan stays shape-uniform.

Numerically identical to the unrolled forward (same ops, same order);
parity-tested in tests/test_scan_forward.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import (
    _activation, _causal_mask, apply_lm_head, apply_norm, apply_rope,
    attn_precision, rope_cos_sin,
)
from asvd4llm_tpu.models.registry import is_lowrank, layer_linear_keys
from asvd4llm_tpu.ops.lowrank import dense_apply


def can_scan(params: dict, spec) -> bool:
    """True iff every decoder layer is all-dense with identical structure
    (bias presence per key) — the stacked representation exists."""
    layers = params["layers"]
    if not layers:
        return False
    # OPT-350m projections ride outside the layer scan but must be dense
    # for the scan forward's dense_apply tail/head
    for pk in ("project_in", "project_out"):
        leaf = params.get(pk)
        if leaf is not None and (is_lowrank(leaf) or "A8" in leaf):
            return False
    keys = layer_linear_keys(spec)
    ref = layers[0]
    for layer in layers:
        for k in keys:
            leaf = layer[k]
            if is_lowrank(leaf) or "A8" in leaf:
                return False
            if (leaf["b"] is None) != (ref[k]["b"] is None):
                return False
            if leaf["w"].shape != ref[k]["w"].shape:
                return False
    return True


def _stack(leaves):
    """Stack per-layer leaves into one [L, ...] device array. Host (numpy)
    leaves are stacked ON HOST first and uploaded in ONE transfer — the
    host-master residency path (models/hostmem.py) where the stacked array
    is the only device copy; jnp.stack over numpy inputs would device_put
    every layer individually and transiently hold 2x on device."""
    if isinstance(leaves[0], np.ndarray):
        return jnp.asarray(np.stack(leaves))
    return jnp.stack(leaves)


def stack_layers(params: dict, spec) -> dict:
    """Stack per-layer leaves into leading-axis arrays:
    {key: {"w": [L, out, in], "b": [L, out] | None}, norm: {"w": [L, H]...}}."""
    layers = params["layers"]
    keys = layer_linear_keys(spec)
    stacked: dict = {}
    for k in keys:
        ws = _stack([l[k]["w"] for l in layers])
        bs = None if layers[0][k]["b"] is None else \
            _stack([l[k]["b"] for l in layers])
        stacked[k] = {"w": ws, "b": bs}
    for nk in layers[0]:
        if nk in keys:
            continue
        stacked[nk] = {
            "w": _stack([l[nk]["w"] for l in layers]),
            "b": None if layers[0][nk]["b"] is None else
            _stack([l[nk]["b"] for l in layers]),
        }
    return stacked


def stacked_num_layers(stacked: dict) -> int:
    """Leading (layer) dimension of the stacked representation."""
    return jax.tree.leaves(stacked)[0].shape[0]


def slice_stacked_weight(stacked: dict, key: str, idx: int):
    """Layer idx's dense weight sliced from the stack — the candidate
    source when per-layer leaves live on host (no re-upload)."""
    return stacked[key]["w"][idx]


# the scan evaluators vmap candidates over this forward, multiplying the
# attention score transient by the candidate count — block over keys
# earlier than the unbatched decoder forward does (decoder._BLOCK_MIN_SQ)
_SCAN_BLOCK_MIN_SQ = 1024


def _stat_contrib(x, collect):
    """Per-call input-statistics contribution of one linear, matching
    decoder.apply_linear (ref act_aware_utils.py:64-74): abs_mean = mean
    over the sequence axis of |x| in f32, summed over batch rows; abs_max =
    elementwise max over all leading axes."""
    absx = jnp.abs(x.astype(jnp.float32))
    flat = absx.reshape(-1, x.shape[-2], x.shape[-1]) if absx.ndim > 2 \
        else absx[None]
    if collect == "abs_mean":
        return flat.mean(axis=-2).sum(axis=0)
    if collect == "abs_max":
        return flat.max(axis=(0, 1))
    raise ValueError(f"unknown stats method {collect!r}")


def _rec(stats, collect, key, x):
    if stats is not None:
        stats[key] = _stat_contrib(x, collect)


def _attention_scan(spec, layer, x, cos, sin, mask, stats=None, collect=None):
    B, S, _ = x.shape
    H, KV, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    _rec(stats, collect, "q_proj", x)
    _rec(stats, collect, "k_proj", x)
    _rec(stats, collect, "v_proj", x)
    q = dense_apply(x, layer["q_proj"]["w"], layer["q_proj"]["b"]).reshape(B, S, H, hd)
    k = dense_apply(x, layer["k_proj"]["w"], layer["k_proj"]["b"]).reshape(B, S, KV, hd)
    v = dense_apply(x, layer["v_proj"]["w"], layer["v_proj"]["b"]).reshape(B, S, KV, hd)
    if spec.pos_emb == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    # grouped-head GQA contraction against raw K/V (no materialized repeat;
    # see models/decoder.py::_attention)
    rep = H // KV
    scale = spec.attn_scale if spec.attn_scale is not None else hd ** -0.5
    qg = q.reshape(B, S, KV, rep, hd)
    if S >= _SCAN_BLOCK_MIN_SQ:
        from asvd4llm_tpu.models.decoder import _attention_blocked
        out = _attention_blocked(spec, qg, k, v, mask, scale)
    else:
        logits = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k,
                            preferred_element_type=jnp.float32,
                            precision=attn_precision(qg.dtype)) * scale
        if spec.attn_logit_softcap > 0:
            logits = spec.attn_logit_softcap * jnp.tanh(
                logits / spec.attn_logit_softcap)
        probs = jax.nn.softmax((logits + mask[:, :, None]).astype(jnp.float32),
                               axis=-1).astype(v.dtype)
        out = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v,
                         preferred_element_type=jnp.float32,
                         precision=attn_precision(v.dtype)).astype(x.dtype)
        out = out.reshape(B, S, H * hd)
    o_key = "o_proj" if "o_proj" in layer else "out_proj"
    _rec(stats, collect, o_key, out)
    return dense_apply(out, layer[o_key]["w"], layer[o_key]["b"])


def _layer_scan_body(spec, x, layer, cos, sin, mask, stats=None,
                     collect=None):
    if spec.family == "opt":
        residual = x
        h = apply_norm(spec, layer["ln1"], x) if spec.do_layer_norm_before else x
        x = residual + _attention_scan(spec, layer, h, cos, sin, mask,
                                       stats, collect)
        if not spec.do_layer_norm_before:
            x = apply_norm(spec, layer["ln1"], x)
        residual = x
        h = apply_norm(spec, layer["ln2"], x) if spec.do_layer_norm_before else x
        _rec(stats, collect, "fc1", h)
        h = _activation(spec, dense_apply(h, layer["fc1"]["w"],
                                          layer["fc1"]["b"]))
        _rec(stats, collect, "fc2", h)
        h = dense_apply(h, layer["fc2"]["w"], layer["fc2"]["b"])
        x = residual + h
        if not spec.do_layer_norm_before:
            x = apply_norm(spec, layer["ln2"], x)
        return x

    residual = x
    h = apply_norm(spec, layer["ln1"], x)
    attn = _attention_scan(spec, layer, h, cos, sin, mask, stats, collect)
    if spec.post_attn_out_norm:
        attn = apply_norm(spec, layer["ln1_post"], attn)
    x = residual + attn
    residual = x
    h = apply_norm(spec, layer["ln2"], x)
    _rec(stats, collect, "gate_proj", h)
    _rec(stats, collect, "up_proj", h)
    gate = _activation(spec, dense_apply(h, layer["gate_proj"]["w"],
                                         layer["gate_proj"]["b"]))
    up = dense_apply(h, layer["up_proj"]["w"], layer["up_proj"]["b"])
    _rec(stats, collect, "down_proj", gate * up)
    mlp = dense_apply(gate * up, layer["down_proj"]["w"],
                      layer["down_proj"]["b"])
    if spec.post_mlp_out_norm:
        mlp = apply_norm(spec, layer["ln2_post"], mlp)
    return residual + mlp


def embed_scan_inputs(params, input_ids, spec):
    """Embeddings (+ embed scale, OPT project_in, learned positions) — the
    layer-0 input hidden states, and the rope tables."""
    S = input_ids.shape[1]
    x = params["embed_tokens"][input_ids]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:
        # OPT-350m: word_embed_proj_dim -> hidden before positions
        # (decoder.forward_hidden:331-335)
        x = dense_apply(x, params["project_in"]["w"],
                        params["project_in"]["b"])
    positions = jnp.arange(S, dtype=jnp.int32)
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][positions + spec.pos_offset]
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
    return x, cos, sin


def scan_masks(spec, L, S, pad_mask=None):
    """(global_mask, sliding_mask, per-layer sliding flags) for a scan
    over L layers at sequence length S — the body selects between the two
    masks so the scan stays shape-uniform across sliding/global layers."""
    import dataclasses

    positions = jnp.arange(S, dtype=jnp.int32)
    no_sliding_spec = dataclasses.replace(spec, sliding_window=0)
    global_mask = _causal_mask(no_sliding_spec, 0, positions, positions,
                               pad_mask)
    sliding_idx = next((i for i in range(L) if spec.layer_uses_sliding(i)),
                       None)
    sliding_mask = global_mask if sliding_idx is None else \
        _causal_mask(spec, sliding_idx, positions, positions, pad_mask)
    flags = jnp.asarray([spec.layer_uses_sliding(i) for i in range(L)])
    return global_mask, sliding_mask, flags


def _finish_hidden(params, spec, x):
    """Final norm + OPT project_out (decoder.forward_hidden:372-377)."""
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        x = dense_apply(x, params["project_out"]["w"],
                        params["project_out"]["b"])
    return x


def forward_hidden_scan(params, input_ids, spec, *, pad_mask=None,
                        stacked=None, substitute=None):
    """Embeddings + lax.scan over stacked layers + final norm.

    stacked: pre-stacked layers (stack_layers output) to avoid restacking
    per call when the caller evaluates many variants of one model.
    substitute: optional (leaf_key, target_idx, w_hat) — layer target's
    `leaf_key` dense weight is replaced by w_hat via a TRACED select
    inside the scan body, so the compiled program is independent of BOTH
    the model depth and which layer is substituted (the sensitivity
    scan's whole-grid evaluator compiles once per shape bucket, O(1) in
    depth)."""
    B, S = input_ids.shape
    x, cos, sin = embed_scan_inputs(params, input_ids, spec)
    if stacked is None:
        stacked = stack_layers(params, spec)
    L = stacked_num_layers(stacked)
    global_mask, sliding_mask, flags = scan_masks(spec, L, S, pad_mask)

    def body(x, scanned):
        layer, sliding, idx = scanned
        if substitute is not None:
            sub_key, target, w_hat = substitute
            leaf = dict(layer[sub_key])
            leaf["w"] = jnp.where(idx == target, w_hat,
                                  leaf["w"]).astype(leaf["w"].dtype)
            layer = {**layer, sub_key: leaf}
        mask = jnp.where(sliding, sliding_mask, global_mask)
        return _layer_scan_body(spec, x, layer, cos, sin, mask), None

    x, _ = jax.lax.scan(body, x, (stacked, flags,
                                  jnp.arange(L, dtype=jnp.int32)))
    return _finish_hidden(params, spec, x)


def forward_stats_scan(params, input_ids, spec, *, stacked, collect,
                       pad_mask=None):
    """Stats-collecting forward over the STACKED layer representation —
    the host-master-residency twin of decoder.forward_with_stats (which
    needs per-layer device leaves): one lax.scan whose per-step stats
    outputs stack to [L, in_features] per linear key, so the program is
    O(1) in depth and the decoder weights exist on device exactly once.

    Returns (layer_stats {key: [L, in]}, extra_stats {name: [in]}) with
    the same per-call contribution semantics as decoder.apply_linear
    (ref act_aware_utils.py:64-74); the caller combines across batches.
    `params` may omit "layers" entirely (slim head-params)."""
    B, S = input_ids.shape
    extra: dict = {}
    x = params["embed_tokens"][input_ids]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if params.get("project_in") is not None:
        _rec(extra, collect, "model.decoder.project_in", x)
        x = dense_apply(x, params["project_in"]["w"],
                        params["project_in"]["b"])
    positions = jnp.arange(S, dtype=jnp.int32)
    if spec.pos_emb == "learned":
        x = x + params["embed_positions"][positions + spec.pos_offset]
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
    L = stacked_num_layers(stacked)
    global_mask, sliding_mask, flags = scan_masks(spec, L, S, pad_mask)

    def body(x, scanned):
        layer, sliding = scanned
        mask = jnp.where(sliding, sliding_mask, global_mask)
        st: dict = {}
        x = _layer_scan_body(spec, x, layer, cos, sin, mask, stats=st,
                             collect=collect)
        return x, st

    x, layer_stats = jax.lax.scan(body, x, (stacked, flags))
    if spec.final_norm and params.get("final_norm") is not None:
        x = apply_norm(spec, params["final_norm"], x)
    if params.get("project_out") is not None:
        _rec(extra, collect, "model.decoder.project_out", x)
        x = dense_apply(x, params["project_out"]["w"],
                        params["project_out"]["b"])
    # lm_head stats fire on the finished hidden whether or not the head is
    # tied (decoder.apply_lm_head; the reference's hook covers lm_head only
    # when it is a distinct nn.Linear, but ours matches forward_with_stats)
    _rec(extra, collect, "lm_head", x)
    return layer_stats, extra


def _index_stacked(stacked, i):
    """Slice layer i's leaves out of the stacked representation (executed
    INSIDE a cond branch so skipped layers fetch no weights)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
        stacked)


def forward_hidden_scan_from(params, hidden, spec, *, stacked, start,
                             substitute=None, pad_mask=None):
    """Resume the stacked-layer scan at layer `start` (a TRACED int32)
    from cached hidden states `hidden` [B, S, H] — embeddings and layers
    < start already applied. Layers i < start are skipped by a lax.cond
    whose taken branch does the weight gather, so the prefix costs neither
    compute nor HBM weight traffic. This is the sensitivity scan's
    prefix-cache: candidates at layer l only ever pay the l..L-1 suffix
    (half the full forward on average), and the compiled program is still
    O(1) in depth and independent of `start`."""
    B, S, _ = hidden.shape
    positions = jnp.arange(S, dtype=jnp.int32)
    if spec.pos_emb == "learned":
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
    L = stacked_num_layers(stacked)
    global_mask, sliding_mask, flags = scan_masks(spec, L, S, pad_mask)

    def body(x, i):
        def run(h):
            layer = _index_stacked(stacked, i)
            if substitute is not None:
                sub_key, target, w_hat = substitute
                leaf = dict(layer[sub_key])
                leaf["w"] = jnp.where(i == target, w_hat,
                                      leaf["w"]).astype(leaf["w"].dtype)
                layer = {**layer, sub_key: leaf}
            mask = jnp.where(flags[i], sliding_mask, global_mask)
            return _layer_scan_body(spec, x, layer, cos, sin, mask)

        return jax.lax.cond(i >= start, run, lambda h: h, x), None

    x, _ = jax.lax.scan(body, hidden, jnp.arange(L, dtype=jnp.int32))
    return _finish_hidden(params, spec, x)


def apply_stacked_layer(params, hidden, spec, *, stacked, idx,
                        pad_mask=None):
    """Apply decoder layer `idx` (traced int32) to hidden [B, S, H] — the
    incremental prefix-cache update: after layer l's grid is scored, one
    call advances the cached dense hidden from layer l's input to layer
    l+1's input."""
    B, S, _ = hidden.shape
    positions = jnp.arange(S, dtype=jnp.int32)
    if spec.pos_emb == "learned":
        cos = sin = None
    else:
        cos, sin = rope_cos_sin(positions, spec.head_dim, spec.rope_theta)
    L = stacked_num_layers(stacked)
    global_mask, sliding_mask, flags = scan_masks(spec, L, S, pad_mask)
    layer = _index_stacked(stacked, idx)
    mask = jnp.where(flags[idx], sliding_mask, global_mask)
    return _layer_scan_body(spec, hidden, layer, cos, sin, mask)


@functools.partial(jax.jit, static_argnames=("spec",))
def forward_scan(params, input_ids, spec):
    """Full scan-layers forward -> logits [B, S, V] float32."""
    hidden = forward_hidden_scan(params, input_ids, spec)
    return apply_lm_head(params, spec, hidden)
