"""Device mesh + sharding rules (the reference has NO distributed backend —
its parallelism is HF accelerate layer placement plus shell-level job
fan-out, ref asvd.py:25-27, experiments/kv_cache.sh; see SURVEY §2.3/§5.8.
This module is the TPU-native green-field replacement).

Design: a 2-axis logical mesh ("dp", "tp") over ICI. Parameters get
NamedShardings; jit + GSPMD inserts the collectives:

- column-parallel linears (q/k/v/gate/up/fc1): weight [out, in] sharded
  ("tp", None) — output activations end up head-sharded, no collective;
- row-parallel linears (o/down/fc2): weight sharded (None, "tp") — GSPMD
  emits one psum per layer output, riding ICI;
- low-rank leaves: column-parallel layers shard A on out ("tp", None) with
  B replicated; row-parallel layers shard B on in (None, "tp") with A
  replicated — the cross-shard reduction then happens on the RANK dim
  (cheaper than the dense row-parallel psum whenever rank < out);
- embeddings / lm_head shard the vocab dim; norms replicate;
- calibration/eval batches shard over "dp"; stats reductions (sum/max over
  batch) become cross-dp psum/pmax automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# layer-key -> parallel style
_COLUMN_KEYS = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1"}
_ROW_KEYS = {"o_proj", "out_proj", "down_proj", "fc2"}


def make_mesh(shape=(1, 1), devices=None, axis_names=("dp", "tp")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def make_multislice_mesh(dcn: int = 1, dp: int = 1, tp: int = 1,
                         devices=None) -> Mesh:
    """3-axis ("dcn", "dp", "tp") mesh for multi-slice pods.

    tp is innermost (ICI ring within a slice); dcn outermost (the slow
    inter-slice DCN links). The sharding rules in this module put ONLY
    batch axes on ("dcn", "dp") — parameters shard on tp WITHIN a slice
    and replicate across slices — so the only cross-DCN collectives GSPMD
    inserts are the O(stats)-sized calibration/loss reductions, never
    O(weights) tensor-parallel traffic (scaling-book recipe: weight
    collectives ride ICI, data reductions may ride DCN).

    On real multi-slice hardware the device order comes from
    mesh_utils.create_hybrid_device_mesh (DCN-topology aware); on a
    single slice or the virtual CPU mesh a plain reshape gives the same
    logical mesh."""
    devices = devices if devices is not None else jax.devices()
    n = dcn * dp * tp
    assert n <= len(devices), \
        f"mesh (dcn={dcn}, dp={dp}, tp={tp}) needs {n} devices, " \
        f"have {len(devices)}"
    try:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (dp, tp), (dcn, 1), devices=devices[:n]).reshape(dcn, dp, tp)
    except Exception:   # single slice / CPU: no DCN topology to respect
        arr = np.asarray(devices[:n]).reshape(dcn, dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))


def _leaf_spec(key: str, leaf: dict, tp_size: int) -> dict:
    """PartitionSpecs for one linear leaf dict (dense, low-rank, q8, q4).

    Quantized leaves shard like their float low-rank counterparts: the
    A-side codes AND their per-row scale/zero vectors ride the out dim
    (column-parallel) while B replicates, and vice versa for row-parallel
    — dequantization is per-row, so scales shard with their rows."""
    if tp_size <= 1:
        return {k: P() for k in leaf if leaf[k] is not None} | \
               {k: None for k in leaf if leaf[k] is None}
    is_lr = "A" in leaf
    is_q = "A8" in leaf or "A4" in leaf
    a_key = "A8" if "A8" in leaf else "A4"
    if key in _COLUMN_KEYS:
        if is_lr:
            specs = {"A": P("tp", None), "B": P(), "b": P("tp")}
        elif is_q:
            specs = {a_key: P("tp", None), "Asc": P("tp", None),
                     "Azp": P("tp", None), "Azs": P("tp", None),
                     "b": P("tp")}
        else:
            specs = {"w": P("tp", None), "b": P("tp")}
    elif key in _ROW_KEYS:
        if is_lr:
            specs = {"A": P(), "B": P(None, "tp"), "b": P()}
        elif "B8" in leaf:
            # q8 row-parallel: unpacked int8 codes shard their input dim;
            # per-row scales ride the (replicated) rank dim
            specs = {"B8": P(None, "tp"), "b": P()}
        elif is_q:
            # q4 packed codes interleave nibble-halves per column tile —
            # slicing the packed axis would break group/scale alignment;
            # replicate row-parallel q4 leaves
            specs = {}
        else:
            specs = {"w": P(None, "tp"), "b": P()}
    else:
        specs = {k: P() for k in leaf}
    return {k: (None if leaf.get(k) is None else specs.get(k, P()))
            for k in leaf}


def _divisible(leaf_specs: dict, leaf: dict, tp_size: int) -> dict:
    """Fall back to replication for any dim not divisible by tp."""
    out = {}
    for k, spec in leaf_specs.items():
        if spec is None or leaf.get(k) is None:
            out[k] = spec
            continue
        shape = leaf[k].shape
        ok = True
        for dim, axis in zip(shape, tuple(spec) + (None,) * len(shape)):
            if axis == "tp" and dim % tp_size != 0:
                ok = False
        out[k] = spec if ok else P()
    return out


def param_specs(params: dict, spec, tp_size: int) -> dict:
    """PartitionSpec pytree matching the params pytree."""
    from asvd4llm_tpu.models.registry import layer_linear_keys

    def norm_spec(norm):
        if norm is None:
            return None
        return {k: (None if v is None else P()) for k, v in norm.items()}

    out: dict = {}
    V, H = params["embed_tokens"].shape
    out["embed_tokens"] = P("tp", None) if tp_size > 1 and V % tp_size == 0 else P()
    if "embed_positions" in params:
        out["embed_positions"] = P()
    layers = []
    for layer in params["layers"]:
        lsp: dict = {}
        for key, val in layer.items():
            if key in layer_linear_keys(spec):
                lsp[key] = _divisible(_leaf_spec(key, val, tp_size), val, tp_size)
            else:
                lsp[key] = norm_spec(val)
        layers.append(lsp)
    out["layers"] = layers
    out["final_norm"] = norm_spec(params.get("final_norm"))
    for pk in ("project_in", "project_out"):
        if params.get(pk) is not None:
            # OPT-350m projections: small, replicate (any encoding)
            out[pk] = {k: (None if v is None else P())
                       for k, v in params[pk].items()}
    lm = params.get("lm_head")
    if lm is None:
        out["lm_head"] = None
    elif "w" in lm:
        Vl, _ = lm["w"].shape
        wspec = P("tp", None) if tp_size > 1 and Vl % tp_size == 0 else P()
        out["lm_head"] = {"w": wspec,
                          "b": None if lm.get("b") is None else P()}
    else:
        # compressed head: column-parallel low-rank/q8 layout (A sharded on
        # the vocab dim, B replicated), same rule as q/k/v leaves
        out["lm_head"] = _divisible(_leaf_spec("q_proj", lm, tp_size),
                                    lm, tp_size)
    return out


def param_shardings(params: dict, spec, mesh: Mesh) -> dict:
    tp_size = mesh.shape.get("tp", 1)
    specs = param_specs(params, spec, tp_size)
    return jax.tree.map(
        lambda s: None if s is None else NamedSharding(mesh, s),
        specs, is_leaf=lambda x: x is None or isinstance(x, P))


def shard_params(params: dict, spec, mesh: Mesh) -> dict:
    """Place a host params pytree onto the mesh with the TP layout."""
    shardings = param_shardings(params, spec, mesh)
    return jax.tree.map(
        lambda x, s: x if s is None or x is None else jax.device_put(x, s),
        params, shardings,
        is_leaf=lambda x: x is None or not isinstance(x, (dict, list)))


def data_sharding(mesh: Mesh, *, batch_axis=None) -> NamedSharding:
    """[B, S] token batches shard over the data-parallel axes — ("dcn",
    "dp") jointly on a multi-slice mesh, "dp" otherwise."""
    if batch_axis is None:
        axes = tuple(a for a in ("dcn", "dp") if a in mesh.shape)
        batch_axis = axes if len(axes) > 1 else (axes[0] if axes else "dp")
    return NamedSharding(mesh, P(batch_axis, None))


def paged_pool_shardings(pools: list, mesh: Mesh) -> list:
    """Shardings for serving/paged.py page pools: dense K/V pools
    [NP, page, KV, hd] shard their heads over tp (matching the
    column-parallel k/v projections that produce them); rank-dim latent
    pools [NP, page, R] replicate (the latent is the output of the
    REPLICATED B factor; the tp-sharded A factor up-projects it to sharded
    heads at attention time). Page axes never shard — any sequence's pages
    must be reachable from every shard."""
    tp_size = mesh.shape.get("tp", 1)
    out = []
    for pool in pools:
        d = {}
        for k, v in pool.items():
            if v.ndim == 4 and tp_size > 1 and v.shape[2] % tp_size == 0:
                d[k] = NamedSharding(mesh, P(None, None, "tp", None))
            else:
                d[k] = NamedSharding(mesh, P())
        out.append(d)
    return out


def shard_paged_pools(pools: list, mesh: Mesh) -> list:
    shardings = paged_pool_shardings(pools, mesh)
    return jax.tree.map(jax.device_put, pools, shardings)
