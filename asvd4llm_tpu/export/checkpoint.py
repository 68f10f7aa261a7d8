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


def _manifest(spec: DecoderSpec, manifest_ranks: dict, cfg=None) -> dict:
    return {
        "format_version": 1,
        "spec": dataclasses.asdict(spec),
        "truncation_ranks": manifest_ranks,
        "config": None if cfg is None else cfg.to_dict(),
    }


def save_compressed(path: str, params: dict, spec: DecoderSpec,
                    manifest_ranks: dict, cfg=None) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(_manifest(spec, manifest_ranks, cfg), f, indent=2)
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
