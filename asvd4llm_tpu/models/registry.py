"""Linear-layer registry over the params pytree.

The reference discovers compressible layers by walking the nn.Module tree
for isinstance(nn.Linear) and mutating modules in place
(ref sensitivity.py:19-33, binary_search.py:11-27). Here params are a
pytree of values; a "linear" is a leaf dict and substitution is functional.

Leaf encodings (structure, not tags, so pytrees stay jit-compatible):
  dense:    {"w": [out, in], "b": [out] | None}
  lowrank:  {"A": [out, rank], "B": [rank, in], "b": [out] | None}

Full names follow HF module naming so sensitivity dicts and rank manifests
read like the reference's (e.g. "model.layers.3.self_attn.q_proj",
"model.decoder.layers.0.fc1").
"""

from __future__ import annotations

from typing import Iterator


def dense_leaf(w, b=None) -> dict:
    return {"w": w, "b": b}


def lowrank_leaf(a, b_factor, bias=None) -> dict:
    return {"A": a, "B": b_factor, "b": bias}


def is_lowrank(leaf: dict) -> bool:
    return "A" in leaf


def q8_lowrank_leaf(a8, a_scale, a_zero, b8, b_scale, b_zero, bias=None
                    ) -> dict:
    """Int8-quantized low-rank leaf: factor codes + per-row (scale, zero).
    The deployment format for the fused q8 Pallas decode kernel."""
    return {"A8": a8, "Asc": a_scale, "Azp": a_zero,
            "B8": b8, "Bsc": b_scale, "Bzp": b_zero, "b": bias}


def is_q8_lowrank(leaf: dict) -> bool:
    return "A8" in leaf


def leaf_shape(leaf: dict) -> tuple[int, int]:
    """(out_features, in_features) of any encoding."""
    if is_q8_lowrank(leaf):
        return leaf["A8"].shape[0], leaf["B8"].shape[1]
    if is_lowrank(leaf):
        return leaf["A"].shape[0], leaf["B"].shape[1]
    return leaf["w"].shape


def leaf_n_params(leaf: dict) -> int:
    if is_q8_lowrank(leaf):
        return leaf["A8"].size + leaf["B8"].size
    if is_lowrank(leaf):
        return leaf["A"].size + leaf["B"].size
    return leaf["w"].size


# Per-family linear key sets inside one decoder layer, in HF child order.
GATED_MLP_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj")
PLAIN_MLP_KEYS = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def layer_linear_keys(spec) -> tuple[str, ...]:
    return GATED_MLP_KEYS if spec.mlp == "gated" else PLAIN_MLP_KEYS


def _layer_prefix(spec, i: int) -> str:
    if spec.family == "opt":
        return f"model.decoder.layers.{i}"
    return f"model.layers.{i}"


def _hf_subname(spec, key: str) -> str:
    if key in ("fc1", "fc2"):
        return key
    if key in ("gate_proj", "up_proj", "down_proj"):
        return f"mlp.{key}"
    return f"self_attn.{key}"


def linear_name(spec, layer_idx: int, key: str) -> str:
    return f"{_layer_prefix(spec, layer_idx)}.{_hf_subname(spec, key)}"


def parse_linear_name(spec, name: str) -> tuple[int, str]:
    """Inverse of linear_name -> (layer_idx, key)."""
    parts = name.split(".")
    idx = parts.index("layers") + 1
    return int(parts[idx]), parts[-1]


def linear_names(params: dict, spec) -> list[str]:
    return [linear_name(spec, i, k)
            for i in range(len(params["layers"]))
            for k in layer_linear_keys(spec)]


def iter_linears(params: dict, spec) -> Iterator[tuple[str, dict]]:
    """Yield (full_name, leaf) for every compressible linear.

    Like the reference we only expose decoder-layer linears to compression
    (the lm_head is never in an OPT/Llama decoder layer walk's scope in
    practice: sensitivity/binary-search operate on every nn.Linear, but the
    published checkpoints only factor layer projections)."""
    for i, layer in enumerate(params["layers"]):
        for k in layer_linear_keys(spec):
            yield linear_name(spec, i, k), layer[k]


def get_linear(params: dict, spec, name: str) -> dict:
    i, key = parse_linear_name(spec, name)
    return params["layers"][i][key]


def set_linear(params: dict, spec, name: str, leaf: dict) -> dict:
    """Functional substitution: returns a new params pytree with one leaf
    replaced (shallow-copies only the touched path)."""
    i, key = parse_linear_name(spec, name)
    layers = list(params["layers"])
    layer = dict(layers[i])
    layer[key] = leaf
    layers[i] = layer
    out = dict(params)
    out["layers"] = layers
    return out


def count_linear_params(params: dict, spec) -> int:
    return sum(leaf_n_params(leaf) for _, leaf in iter_linears(params, spec))
