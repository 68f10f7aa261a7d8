"""Native compressed-model checkpointing: Orbax params + rank manifest.

The reference's deployable artifact is an HF repo whose config carries
``truncation_ranks`` so the custom modeling class can rebuild factored
shapes before loading weights (ref build_asvd_repo.py:65-69,
modeling_asvd_llama.py:14-42). The native equivalent here:

- ``params.orbax/``   — the full (dense + low-rank) pytree, Orbax format;
- ``manifest.json``   — {"spec": DecoderSpec fields,
                         "truncation_ranks": {layer_name: rank},
                         "config": the ASVDConfig that produced it}.

``load_compressed`` reconstructs the pytree structure from the manifest
(dense skeleton + low-rank leaves at manifested shapes) and restores into
it, so loading never needs the original dense checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.spec import DecoderSpec


def _leaf_encoding(leaf: dict):
    """Serializable description of a non-dense linear leaf (low-rank or
    quantized deployment formats), enough to rebuild its zero skeleton."""
    from asvd4llm_tpu.models.registry import (
        is_lowrank, is_q4_lowrank, is_q8_lowrank,
    )

    if is_q4_lowrank(leaf):
        kind = "q4"
    elif is_q8_lowrank(leaf):
        kind = "q8"
    elif is_lowrank(leaf):
        kind = "lowrank"
    else:
        return None
    return {
        "kind": kind,
        "arrays": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                   for k, v in leaf.items() if k != "b" and v is not None},
        "bias": leaf.get("b") is not None,
    }


def _manifest(spec: DecoderSpec, manifest_ranks: dict, cfg=None,
              params=None) -> dict:
    encodings = {}
    if params is not None:
        from asvd4llm_tpu.models.registry import iter_linears
        for name, leaf in iter_linears(params, spec, include_extras=True):
            enc = _leaf_encoding(leaf)
            if enc is not None:
                encodings[name] = enc
    return {
        "format_version": 2,
        "spec": dataclasses.asdict(spec),
        "truncation_ranks": manifest_ranks,
        # per-leaf encodings (v2): lets quantized q4/q8 deployments
        # round-trip natively, not just plain low-rank factors
        "encodings": encodings,
        "config": None if cfg is None else cfg.to_dict(),
    }


def save_compressed(path: str, params: dict, spec: DecoderSpec,
                    manifest_ranks: dict, cfg=None) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(_manifest(spec, manifest_ranks, cfg, params), f, indent=2)
    ckpt_dir = os.path.abspath(os.path.join(path, "params.orbax"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_compressed(path: str, dtype=None) -> tuple[dict, DecoderSpec, dict]:
    """Returns (params, spec, manifest_ranks). Rebuilds the factored pytree
    skeleton from the manifest, then restores weights into it — the
    functional analogue of the reference's swap-before-load
    (ref modeling_asvd_llama.py:37-41)."""
    import orbax.checkpoint as ocp

    from asvd4llm_tpu.models.init import init_params
    from asvd4llm_tpu.models.registry import (
        get_linear, lowrank_leaf, set_linear,
    )

    with open(os.path.join(path, "manifest.json")) as f:
        man = json.load(f)
    spec = DecoderSpec(**man["spec"])

    # skeleton with the right structure (values are placeholders)
    skeleton = init_params(spec, jax.random.PRNGKey(0),
                           dtype=dtype or jnp.bfloat16)
    encodings = man.get("encodings")
    if encodings:  # format v2: any leaf encoding (lowrank / q8 / q4)
        for name, enc in encodings.items():
            leaf = get_linear(skeleton, spec, name)
            new = {k: jnp.zeros(tuple(d["shape"]), jnp.dtype(d["dtype"]))
                   for k, d in enc["arrays"].items()}
            if enc["bias"]:
                if leaf.get("b") is not None:
                    new["b"] = leaf["b"]
                else:  # e.g. a factored tied head: bias dim from A's rows
                    out_dim = next(d["shape"][0]
                                   for k, d in enc["arrays"].items()
                                   if k in ("A", "A8", "Asc"))
                    new["b"] = jnp.zeros((out_dim,), dtype or jnp.bfloat16)
            else:
                new["b"] = None
            skeleton = set_linear(skeleton, spec, name, new)
    else:  # format v1: rank manifest implies plain low-rank leaves
        for name, rank in man["truncation_ranks"].items():
            leaf = get_linear(skeleton, spec, name)
            out_f, in_f = leaf["w"].shape
            skeleton = set_linear(
                skeleton, spec, name,
                lowrank_leaf(jnp.zeros((out_f, rank), leaf["w"].dtype),
                             jnp.zeros((rank, in_f), leaf["w"].dtype),
                             leaf["b"]))

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), skeleton)
    params = ckptr.restore(os.path.abspath(os.path.join(path, "params.orbax")),
                           abstract)
    return params, spec, man["truncation_ranks"]
