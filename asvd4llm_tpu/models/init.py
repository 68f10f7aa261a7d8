"""Random parameter initialization for a DecoderSpec (demo/bench/test use —
real runs convert HF checkpoints via models/loader.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from asvd4llm_tpu.models.registry import dense_leaf
from asvd4llm_tpu.models.spec import DecoderSpec


def _linear_shapes(spec: DecoderSpec) -> dict:
    H, Q, KV, I = (spec.hidden_size, spec.q_dim, spec.kv_dim,
                   spec.intermediate_size)
    if spec.mlp == "gated":
        return {"q_proj": (Q, H), "k_proj": (KV, H), "v_proj": (KV, H),
                "o_proj": (H, Q), "gate_proj": (I, H), "up_proj": (I, H),
                "down_proj": (H, I)}
    return {"q_proj": (Q, H), "k_proj": (KV, H), "v_proj": (KV, H),
            "out_proj": (H, Q), "fc1": (I, H), "fc2": (H, I)}


def _norm_keys(spec: DecoderSpec) -> list[str]:
    keys = ["ln1", "ln2"]
    if spec.post_attn_out_norm:
        keys.append("ln1_post")
    if spec.post_mlp_out_norm:
        keys.append("ln2_post")
    return keys


def init_params(spec: DecoderSpec, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """He-ish scaled random params with the exact pytree layout of
    loader.params_from_state_dict."""
    H = spec.hidden_size
    shapes = _linear_shapes(spec)

    def norm_leaf():
        return {"w": jnp.ones((H,), dtype),
                "b": jnp.zeros((H,), dtype) if spec.norm == "layernorm" else None}

    n_keys = 3 + spec.num_layers * (len(shapes) + len(_norm_keys(spec)))
    keys = iter(jax.random.split(key, n_keys))

    params: dict = {}
    params["embed_tokens"] = (jax.random.normal(next(keys),
                              (spec.vocab_size, H)) * 0.02).astype(dtype)
    if spec.pos_emb == "learned":
        params["embed_positions"] = (jax.random.normal(
            next(keys), (spec.max_position_embeddings + spec.pos_offset, H))
            * 0.02).astype(dtype)

    layers = []
    for _ in range(spec.num_layers):
        layer: dict = {}
        for k, (o, i) in shapes.items():
            w = (jax.random.normal(next(keys), (o, i)) * (i ** -0.5)).astype(dtype)
            b = jnp.zeros((o,), dtype) if (
                spec.attn_bias if k not in ("fc1", "fc2", "gate_proj",
                                            "up_proj", "down_proj")
                else spec.mlp_bias) else None
            layer[k] = dense_leaf(w, b)
        for nk in _norm_keys(spec):
            layer[nk] = norm_leaf()
        layers.append(layer)
    params["layers"] = layers
    params["final_norm"] = norm_leaf() if spec.final_norm else None
    if spec.tie_word_embeddings:
        params["lm_head"] = None
    else:
        params["lm_head"] = dense_leaf(
            (jax.random.normal(next(keys), (spec.vocab_size, H)) * 0.02
             ).astype(dtype), None)
    return params
