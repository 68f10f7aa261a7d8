"""Per-layer sensitivity scanning.

Reference behavior (ref sensitivity.py:10-61): for every linear layer and
every candidate ratio ([0.4..0.9] for weights, [0.1..1.9] for KV mode),
factorize THAT ONE layer (always act-aware, regardless of --act_aware —
ref :50, quirk kept for parity), measure calibration-set perplexity, and
restore. Result: {layer_full_name: {ratio: ppl}}.

TPU-native re-design of the hot loop:

1. **Recomposition trick**: instead of swapping a two-factor layer in (a
   different pytree structure per point → recompile storm), we substitute
   a same-shaped DENSE leaf with w = A @ B. Numerically identical output,
   and the jitted evaluator compiles exactly once for the whole scan.
2. **Shape-bucketed batched SVD**: all layers sharing a weight shape are
   factorized per-ratio in one vmapped device call (ops/svd.py), instead
   of L·R serial SVDs.
"""

from __future__ import annotations

import functools
import logging
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.eval.ppl import evaluate_perplexity
from asvd4llm_tpu.models.registry import (
    dense_leaf, get_linear, iter_linears, leaf_shape, set_linear,
)
from asvd4llm_tpu.ops.asvd import (
    build_scaling_vector, factorize_weight, rank_for_param_ratio,
)
from asvd4llm_tpu.ops.svd import singular_values

log = logging.getLogger(__name__)

WEIGHT_RATIO_GRID = [0.4, 0.5, 0.6, 0.7, 0.8, 0.9]          # ref :39
KV_RATIO_GRID = [0.1 * i for i in range(1, 20)]               # ref :37
STABLE_RANK_GRID = [0.1 * i for i in range(1, 10)]            # ref :90


def _recomposed_dense(w, bias, ratio, scale, alpha, rank_align, svd_backend,
                      key):
    """Factorize and immediately recompose to a dense same-shape leaf."""
    out_f, in_f = w.shape
    rank = rank_for_param_ratio(in_f, out_f, ratio, rank_align)
    if rank <= 0:
        return None
    rank = min(rank, in_f, out_f)
    a, b = factorize_weight(w, rank, scale=scale, sigma_fuse="UV",
                            backend=svd_backend, key=key)
    w_hat = (a @ b).astype(w.dtype)
    if not bool(jnp.isfinite(w_hat).all()):
        return None
    return dense_leaf(w_hat, bias)


def _recomposed_dense_all_ratios(w, bias, ratios, scale, rank_align,
                                 svd_backend, key):
    """ONE SVD per layer serving every ratio in the grid: truncating a
    rank-R factorization at r < R gives exactly the rank-r ASVD solution,
    so the reference's per-(layer, ratio) SVD loop (ref sensitivity.py:
    43-59, 6 SVDs per layer) collapses to a single decomposition + cheap
    GEMM recompositions. Returns {ratio: dense_leaf | None}."""
    from asvd4llm_tpu.ops.svd import truncated_svd

    out_f, in_f = w.shape
    ranks = {r: min(rank_for_param_ratio(in_f, out_f, r, rank_align),
                    in_f, out_f)
             for r in ratios}
    max_rank = max(ranks.values())
    if max_rank <= 0:
        return {r: None for r in ratios}

    w32 = w.astype(jnp.float32)
    if scale is not None:
        w32 = w32 * scale[None, :]
    u, s, vh = truncated_svd(w32, max_rank, backend=svd_backend, key=key)
    if scale is not None:
        vh = vh / scale[None, :]

    out = {}
    for r, rank in ranks.items():
        if rank <= 0:
            out[r] = None
            continue
        w_hat = ((u[:, :rank] * s[:rank][None, :]) @ vh[:rank, :]).astype(w.dtype)
        out[r] = dense_leaf(w_hat, bias) if bool(jnp.isfinite(w_hat).all()) \
            else None
    return out


@functools.partial(jax.jit, static_argnames=("ranks", "backend"))
def _recompose_stack(w, scale, ranks: tuple, backend: str, key):
    """One device program per (shape, ranks) bucket: single SVD at
    max(ranks), every ratio's dense recomposition, and the finite flags —
    replaces ~15 host dispatches (incl. a bool() sync per ratio) with one
    call + one small fetch."""
    from asvd4llm_tpu.ops.svd import truncated_svd

    w32 = w.astype(jnp.float32) * scale[None, :]
    max_rank = max(ranks)
    u, s, vh = truncated_svd(w32, max_rank, backend=backend, key=key)
    vh = vh / scale[None, :]
    w_hats = jnp.stack([
        ((u[:, :r] * s[:r][None, :]) @ vh[:r, :]).astype(w.dtype)
        for r in ranks])
    finite = jnp.isfinite(w_hats).all(axis=(1, 2))
    return w_hats, finite


@functools.partial(jax.jit, static_argnames=("spec", "key", "limit"))
def _ppl_multi_ratio_bucketed(params, spec, ids, key, target, w_hats, limit):
    """Multi-ratio PPL with the substituted layer chosen by a
    TRACED index: every layer whose `key` weight matches the candidate
    shape reads ``where(i == target, w_hat, W_i)``. The jaxpr is therefore
    identical for every layer in a (key, shape) bucket, so the scan
    compiles once per bucket (≈7 for a uniform model) instead of once per
    layer (224 for a 7B) — decisive when compiles cost minutes through a
    TPU tunnel. Device cost: one extra weight-sized select per matching
    layer, fused into the operand read by XLA."""
    from asvd4llm_tpu.eval.ppl import _rows_nll

    rows = ids[:limit]
    n, L = rows.shape
    rb = min(4, n)
    n_full = (n // rb) * rb
    chunks = rows[:n_full].reshape(n // rb, rb, L)

    def eval_one(w_hat):
        layers = []
        for i, layer in enumerate(params["layers"]):
            leaf = layer.get(key)
            if leaf is not None and "w" in leaf \
                    and leaf["w"].shape == w_hat.shape:
                neww = jnp.where(jnp.int32(i) == target, w_hat, leaf["w"])
                nl = dict(layer)
                nl[key] = {"w": neww.astype(leaf["w"].dtype), "b": leaf["b"]}
                layers.append(nl)
            else:
                layers.append(layer)
        trial = dict(params)
        trial["layers"] = layers

        def body(carry, chunk):
            return carry + _rows_nll(trial, spec, chunk).sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), chunks)
        if n_full < n:
            total = total + _rows_nll(trial, spec, rows[n_full:]).sum()
        return jnp.exp(total / n)

    return jax.vmap(eval_one)(w_hats)


@functools.partial(jax.jit, static_argnames=("spec", "key", "limit"))
def _ppl_multi_ratio_scan(params, stacked, spec, ids, key, target, w_hats,
                          limit):
    """Scan-stacked variant of _ppl_multi_ratio_bucketed: the substitution
    rides INSIDE the lax.scan body (models/scan_forward.py), so the
    compiled program is O(1) in model depth — at 7B-class depth the
    unrolled evaluator's per-bucket compile costs minutes through the TPU
    tunnel and scales with layer count. Requires a uniform all-dense model
    (can_scan); numerically identical to the unrolled evaluator."""
    from asvd4llm_tpu.models.decoder import apply_lm_head
    from asvd4llm_tpu.models.scan_forward import forward_hidden_scan

    rows = ids[:limit]
    n, L = rows.shape
    rb = min(4, n)
    n_full = (n // rb) * rb
    chunks = rows[:n_full].reshape(n // rb, rb, L)

    def nll(w_hat, batch):
        inputs = batch[:, :-1]
        labels = batch[:, 1:]
        hidden = forward_hidden_scan(params, inputs, spec, stacked=stacked,
                                     substitute=(key, target, w_hat))
        logits = apply_lm_head(params, spec, hidden)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, labels[..., None],
                                    axis=-1)[..., 0].mean(axis=-1)

    def eval_one(w_hat):
        def body(carry, chunk):
            return carry + nll(w_hat, chunk).sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), chunks)
        if n_full < n:
            total = total + nll(w_hat, rows[n_full:]).sum()
        return jnp.exp(total / n)

    return jax.vmap(eval_one)(w_hats)


def calib_sensitivity_ppl(params, spec, calib_loader, cfg, *, stats=None,
                          fisher=None, cache=None,
                          batch_ratios: bool | None = None,
                          mesh=None) -> dict:
    """{full_name: {ratio: ppl}} via single-layer decompose + calib PPL
    (ref sensitivity.py:10-61). Always act-aware (ref :50).

    batch_ratios=True evaluates all grid points of a layer in one vmapped
    program (identical math, candidate-batched); False reproduces the
    serial reference loop with a single compiled evaluator.

    mesh: with a dp axis, the candidate (ratio) dimension of the batched
    evaluator shards across data-parallel devices — the grid points of a
    layer evaluate concurrently on different chips (the reference's
    shell-level sweep fan-out, SURVEY §2.3, turned into SPMD)."""
    if cache is not None:
        hit = cache.load_sensitivity(cfg.sensitivity_key())
        if hit is not None:
            log.info("sensitivity cache hit (%s)", cfg.sensitivity_key())
            return hit

    if batch_ratios is None:
        batch_ratios = getattr(cfg, "sensitivity_batch_ratios", True)
    grid = KV_RATIO_GRID if cfg.compress_kv_cache else WEIGHT_RATIO_GRID
    input_ids = np.concatenate(
        [np.asarray(b["input_ids"]) for b in calib_loader], axis=0)

    sensitivity: dict = {}
    include_extras = getattr(cfg, "compress_all_linears", True)
    names = [name for name, _ in iter_linears(params, spec, include_extras)]
    # scan-stacked evaluator: compiles O(1) in depth (decisive for 7B-class
    # models where the unrolled per-bucket compile costs minutes and scales
    # with layer count); requires a uniform all-dense model. The stacked
    # copy DUPLICATES the decoder weights on device, so fall back to the
    # unrolled evaluator when two copies cannot fit in HBM.
    from asvd4llm_tpu.models.scan_forward import can_scan, stack_layers
    use_scan_eval = batch_ratios and can_scan(params, spec)
    if use_scan_eval and jax.default_backend() == "tpu":
        layer_bytes = sum(
            int(np.prod(leaf["w"].shape)) * leaf["w"].dtype.itemsize
            for layer in params["layers"]
            for leaf in layer.values() if isinstance(leaf, dict) and "w" in leaf)
        if 2 * layer_bytes > 11 * 1024 ** 3:
            log.info("scan-stacked evaluator disabled: duplicate decoder "
                     "weights (%.1f GB x2) would exceed HBM; using the "
                     "unrolled evaluator", layer_bytes / 2 ** 30)
            use_scan_eval = False
    stacked = stack_layers(params, spec) if use_scan_eval else None
    from asvd4llm_tpu.models.registry import extra_linear_names
    extras = set(extra_linear_names(params, spec)) if include_extras else set()
    t0 = time.time()
    n_pts = 0
    key = jax.random.PRNGKey(cfg.seed)
    for name in names:
        leaf = get_linear(params, spec, name)
        if "A" in leaf:
            continue  # already low-rank; reference scans raw models only
        scale = build_scaling_vector(
            None if stats is None else stats.get(name),
            None if fisher is None else fisher.get(name),
            cfg.alpha)
        sensitivity[name] = {}
        key, sub = jax.random.split(key)
        limit = min(cfg.n_calib_samples, input_ids.shape[0])
        # extras (lm_head / project_in/out) are not decoder-layer leaves, so
        # the traced-index bucketed evaluator can't address them; they take
        # the serial recomposition path (1-3 layers, negligible)
        if batch_ratios and name not in extras:
            from asvd4llm_tpu.models.registry import parse_linear_name

            out_f, in_f = leaf_shape(leaf)
            ranks = {r: min(rank_for_param_ratio(in_f, out_f, r,
                                                 cfg.rank_align), in_f, out_f)
                     for r in grid}
            valid = [r for r in grid if ranks[r] > 0]
            for ratio in set(grid) - set(valid):
                sensitivity[name][ratio] = float("inf")
            if not valid:
                continue
            backend = cfg.svd_backend
            if backend == "auto":
                # measured crossover on v5e: svd_bench_r2.json (ops/svd.py)
                small = (out_f * in_f <= 1024 * 1024) or \
                    (max(ranks.values()) >= 0.5 * min(out_f, in_f))
                backend = "exact" if small else "randomized"
            scale_vec = scale if scale is not None else \
                jnp.ones((in_f,), jnp.float32)
            ranks_tuple = tuple(ranks[r] for r in valid)
            if mesh is not None and mesh.shape.get("dp", 1) > 1:
                # pad the candidate axis to a dp multiple so the grid always
                # shards (the 6-point weight grid on dp=4/8 used to silently
                # fall back to replication); padded slots re-evaluate the
                # last rank and are dropped below
                dp = mesh.shape["dp"]
                pad = (-len(ranks_tuple)) % dp
                if pad:
                    log.info("dp-sharding: padding %d candidates to %d "
                             "(dp=%d)", len(ranks_tuple),
                             len(ranks_tuple) + pad, dp)
                ranks_tuple = ranks_tuple + (ranks_tuple[-1],) * pad
            w_hats, finite = _recompose_stack(
                leaf["w"], scale_vec, ranks_tuple, backend, sub)
            if mesh is not None and mesh.shape.get("dp", 1) > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P
                w_hats = jax.device_put(
                    w_hats, NamedSharding(mesh, P("dp", None, None)))
            layer_idx, leaf_key = parse_linear_name(spec, name)
            if use_scan_eval:
                ppls = _ppl_multi_ratio_scan(
                    params, stacked, spec, jnp.asarray(input_ids), leaf_key,
                    jnp.int32(layer_idx), w_hats, limit)
            else:
                ppls = _ppl_multi_ratio_bucketed(
                    params, spec, jnp.asarray(input_ids), leaf_key,
                    jnp.int32(layer_idx), w_hats, limit)
            finite = np.asarray(finite)
            for j, (ratio, ppl) in enumerate(zip(valid, np.asarray(ppls))):
                sensitivity[name][ratio] = float(ppl) if finite[j] \
                    else float("inf")
                n_pts += 1
        else:
            leaves = _recomposed_dense_all_ratios(
                leaf["w"], leaf["b"], grid, scale, cfg.rank_align,
                cfg.svd_backend, sub)
            valid = [r for r in grid if leaves[r] is not None]
            for ratio in set(grid) - set(valid):
                # rank 0 / non-finite: infinitely sensitive at this ratio
                sensitivity[name][ratio] = float("inf")
            if not valid:
                continue
            for ratio in valid:
                trial = set_linear(params, spec, name, leaves[ratio])
                ppl = evaluate_perplexity(trial, spec, input_ids,
                                          cfg.n_calib_samples)
                sensitivity[name][ratio] = ppl
                n_pts += 1
        log.info("sensitivity %s done (%d pts, %.1fs elapsed)",
                 name, n_pts, time.time() - t0)

    if cache is not None:
        cache.save_json("sensitivity", cfg.sensitivity_key(), sensitivity)
    return sensitivity


def calib_sensitivity_stable_rank(params, spec, calib_loader, cfg,
                                  cache=None) -> dict:
    """Forward-free proxy (ref sensitivity.py:64-110): per layer,
    sr = (||W||_F^2 / sigma_max^2)^0.5, score[ratio] = -sr * ratio**0.1.

    TPU-native: singular values of all same-shaped weights in one vmapped
    SVD batch."""
    key_name = "sensitivity_stable_rank"
    if cache is not None:
        raw = cache.load_json(key_name, cfg.sensitivity_key())
        if raw is not None:
            return {n: {float(r): p for r, p in d.items()} for n, d in raw.items()}

    buckets: dict = defaultdict(list)
    for name, leaf in iter_linears(params, spec,
                                   getattr(cfg, "compress_all_linears", True)):
        if "A" in leaf:
            continue
        buckets[leaf_shape(leaf)].append((name, leaf["w"]))

    sensitivity: dict = {}
    for shape, items in buckets.items():
        ws = jnp.stack([w for _, w in items]).astype(jnp.float32)
        svs = jax.vmap(singular_values)(ws)                  # [L, min(m,n)]
        fro2 = jnp.sum(ws * ws, axis=(1, 2))
        sr = jnp.sqrt(fro2 / (svs[:, 0] ** 2))
        for (name, _), sr_i in zip(items, np.asarray(sr)):
            sensitivity[name] = {r: float(-sr_i * r ** 0.1)
                                 for r in STABLE_RANK_GRID}

    if cache is not None:
        cache.save_json(key_name, cfg.sensitivity_key(), sensitivity)
    return sensitivity
