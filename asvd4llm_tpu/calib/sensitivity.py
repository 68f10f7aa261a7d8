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


@functools.partial(jax.jit, static_argnames=("ranks", "backend"))
def _grid_factors(w, scale, ranks: tuple, backend: str, key):
    """SVD factors at max(ranks) for on-demand chunk recomposition — the
    full-depth HBM path: the factors cost (out+in)·max_rank f32 (~166 MB
    for an 11008x4096 MLP leaf) instead of the len(ranks)·out·in dense
    stack (~540 MB), and each chunk of candidates recomposes and frees
    inside the grid loop."""
    if backend == "gram":
        # low-memory form: no f32 matrix copy, no full-width u — the
        # canonical scan's repeated clean-heap OOMs at 13.05 GB resident
        # happen INSIDE this program (ops/svd.py gram_truncated_svd_lowmem)
        from asvd4llm_tpu.ops.svd import gram_truncated_svd_lowmem
        u, s, vh = gram_truncated_svd_lowmem(w, scale, max(ranks))
        return u, s, vh / scale[None, :]
    w32 = w.astype(jnp.float32) * scale[None, :]
    from asvd4llm_tpu.ops.svd import truncated_svd
    u, s, vh = truncated_svd(w32, max(ranks), backend=backend, key=key)
    return u, s, vh / scale[None, :]


@functools.partial(jax.jit, static_argnames=("ranks", "dtype"))
def _recompose_chunk(u, s, vh, ranks: tuple, dtype):
    """Dense recompositions for one chunk of grid ranks + finite flags."""
    w_hats = jnp.stack([
        ((u[:, :r] * s[:r][None, :]) @ vh[:r, :]).astype(dtype)
        for r in ranks])
    return w_hats, jnp.isfinite(w_hats).all(axis=(1, 2))


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


# Row blocking (VERDICT r4 item 6): every jitted scan program below sees a
# FIXED-size row block [rb, S-1, ...], never the full [n_calib, ...] set —
# program shapes (and thus the persistent compile cache) are independent of
# n_calib, so a cheap probe-budget run (n=2) warms the canonical run's
# (n=32) expensive suffix-evaluator programs. The cached hidden lives as a
# LIST of rb-blocks end to end (embed -> advance -> eval); a masked
# remainder block replaces the old second remainder program. rb collapses
# to min(rb, n) only in the tiny-calib regime (n < 2048/(S-1): CPU tests),
# where padding waste would dominate and compiles are cheap anyway.


def _row_block(n: int, S: int) -> int:
    return max(1, min(2048 // max(S - 1, 1), n))


@functools.partial(jax.jit, static_argnames=("spec",))
def _embed_rows(params, spec, rows):
    """[rb, S] id rows -> layer-0 input hidden [rb, S-1, H] (inputs are
    rows[:, :-1]; labels are rows[:, 1:])."""
    from asvd4llm_tpu.models.scan_forward import embed_scan_inputs

    x, _, _ = embed_scan_inputs(params, rows[:, :-1], spec)
    return x


@functools.partial(jax.jit, static_argnames=("spec",))
def _advance_block(params, stacked, spec, hidden, idx):
    """Apply dense decoder layer `idx` (traced) to one row block's cached
    hidden — the incremental prefix update after a layer's grid is done."""
    from asvd4llm_tpu.models.scan_forward import apply_stacked_layer

    return apply_stacked_layer(params, hidden, spec, stacked=stacked,
                               idx=idx)


def _ce_mean_chunked(head_params, spec, out, lab, ck=256):
    """Mean next-token NLL per row WITHOUT materializing [..., S, vocab]
    log-probs: the lm_head GEMM + stable logsumexp + label gather run one
    ck-position slice at a time under lax.scan. At full 7B depth the
    un-chunked log_softmax was the 32-layer OOM (f32 [6, 2047, 32000]
    log-probs + a 1.95G padded layout copy — 3.4G of HLO temps on a
    15.75G chip); slicing bounds the transient at [6, rb, ck, vocab].

    out [..., S, H]; lab [..., S] int. Returns [...] mean NLL."""
    from asvd4llm_tpu.models.decoder import apply_lm_head

    S = out.shape[-2]
    n_full = (S // ck) * ck
    lead = out.shape[:-2]

    def seg_nll(h_seg, l_seg):
        z = apply_lm_head(head_params, spec, h_seg).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(z, axis=-1)
        gold = jnp.take_along_axis(z, l_seg[..., None], axis=-1)[..., 0]
        return (lse - gold).sum(axis=-1)            # [...]

    total = jnp.zeros(lead, jnp.float32)
    if n_full:
        nseg = S // ck
        h_chunks = jnp.moveaxis(
            out[..., :n_full, :].reshape(*lead, nseg, ck, out.shape[-1]),
            -3, 0)                                   # [nseg, ..., ck, H]
        l_chunks = jnp.moveaxis(
            lab[..., :n_full].reshape(*lead, nseg, ck), -2, 0)

        def body(carry, xs):
            h, l = xs
            return carry + seg_nll(h, l), None
        total, _ = jax.lax.scan(body, total, (h_chunks, l_chunks))
    if n_full < S:
        total = total + seg_nll(out[..., n_full:, :], lab[..., n_full:])
    return total / S


@functools.partial(jax.jit, static_argnames=("spec", "leaf_key"))
def _ppl_multi_ratio_suffix(params, stacked, spec, hidden, labels, mask,
                            leaf_key, target, w_hats):
    """Prefix-cached grid evaluator for ONE row block: `hidden` [rb, S-1,
    H] is the dense model's hidden at layer `target`'s input (layers <
    target already applied — identical to what the full forward would
    compute, since a single-layer trial only diverges FROM the substituted
    layer). Each candidate therefore pays only the target..L-1 suffix plus
    the lm_head: half the full forward on average over a scan, and the
    suffix scan itself skips the prefix iterations via lax.cond (no weight
    fetch). Compiles once per (leaf_key, block shape) — O(1) in depth,
    independent of target AND of n_calib (the caller loops fixed-size
    blocks; `mask` [rb] zeroes padded remainder rows). Returns the
    per-candidate SUM of masked per-row mean NLLs [C]."""
    from asvd4llm_tpu.models.scan_forward import forward_hidden_scan_from

    def nll_sum(w_hat):
        out = forward_hidden_scan_from(params, hidden, spec, stacked=stacked,
                                       start=target,
                                       substitute=(leaf_key, target, w_hat))
        return (_ce_mean_chunked(params, spec, out, labels) * mask).sum()

    return jax.vmap(nll_sum)(w_hats)


@functools.partial(jax.jit, static_argnames=("spec",))
def _ppl_head_grid(params, spec, hidden, labels, mask, w_hats, bias):
    """lm_head candidates leave the decoder untouched, so the hidden after
    ALL layers (pre final-norm) is fixed: each grid point costs one head
    GEMM + CE instead of the reference's full forward per ratio
    (ref sensitivity.py:43-59 applied to the lm_head module). One row
    block per call, like _ppl_multi_ratio_suffix."""
    from asvd4llm_tpu.models.scan_forward import _finish_hidden

    def nll_sum(w_hat):
        h_fin = _finish_hidden(params, spec, hidden)
        trial = dict(params)
        trial["lm_head"] = {"w": w_hat, "b": bias}
        return (_ce_mean_chunked(trial, spec, h_fin, labels) * mask).sum()

    return jax.vmap(nll_sum)(w_hats)


def _blocks_ppl(n: int, block_eval) -> "np.ndarray":
    """exp(sum over blocks of masked NLL sums / n) — the host-side block
    accumulator shared by the suffix and head grid evaluators. block_eval
    yields per-candidate NLL-sum arrays; the np.asarray fetch per block is
    also the device sync that bounds live blocks to one."""
    total = None
    for out in block_eval:
        part = np.asarray(out)
        total = part if total is None else total + part
    return np.exp(total / n)


def _load_resume(path):
    """Per-leaf resume state: one JSON line per finished leaf —
    ``{"name", "li", "dt", "ratios": {str(ratio): ppl}}``. Written after
    every leaf so a killed/recycled process (utils/hostguard.py: the axon
    tunnel's per-buffer host retention forces periodic recycling) loses at
    most the leaf in flight.

    Lines with ``"oom": N`` and no ``"ratios"`` are device-OOM markers
    (see ``_grid_eval_oom_safe``): the leaf OOMed HBM N times; a resumed
    attempt forces the low-workspace gram backend for it — and, via the
    marker's ``"shape"``, for every other leaf of the same [out, in]
    shape (the flakiness is shape-at-residency physics, not per-leaf;
    without the generalization a 32-layer scan could pay one process
    recycle per MLP leaf).

    Returns ``({name: (li, dt, {float: float})}, {name: oom_count},
    {(out, in), ...})``."""
    import json
    import os

    state, oom_counts, oom_shapes = {}, {}, set()
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # torn final line from a killed process
                if "ratios" not in rec:
                    if "oom" in rec:
                        oom_counts[rec["name"]] = max(
                            int(rec["oom"]), oom_counts.get(rec["name"], 0))
                        if rec.get("shape"):
                            oom_shapes.add(tuple(rec["shape"]))
                    continue
                state[rec["name"]] = (
                    rec.get("li", -1), rec.get("dt", 0.0),
                    {float(r): float(p) for r, p in rec["ratios"].items()})
    return state, oom_counts, oom_shapes


def _append_resume(path, name, li, dt, ratios):
    import json

    with open(path, "a") as f:
        f.write(json.dumps({"name": name, "li": li, "dt": round(dt, 2),
                            "ratios": {str(r): p for r, p in ratios.items()}})
                + "\n")
        f.flush()


def _append_oom(path, name, count, shape=None):
    import json

    rec = {"name": name, "oom": count}
    if shape is not None:
        rec["shape"] = list(shape)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()


def _grid_eval_oom_safe(call, name, resume, oom_counts, shape=None,
                        oom_shapes=None):
    """Run a leaf's grid eval with device-OOM recovery.

    Round-5 take-2 of the canonical full-depth run died to a TPU
    RESOURCE_EXHAUSTED inside the first MLP leaf's SVD — a leaf take-1 had
    passed with identical code, i.e. HBM-fragmentation flakiness at the
    ~13.5 GB-resident margin, not a planning bug. Recovery ladder:

    1. leaves previously marked OOM (resume jsonl ``"oom"`` records) run
       with the low-workspace gram backend forced from the start;
    2. a fresh OOM is retried once in-process on the gram backend (the
       failed dispatch's workspace is freed on unwind);
    3. if the retry also OOMs, persist the marker and raise
       :class:`~asvd4llm_tpu.utils.hostguard.HostBudgetExceeded` — the
       rc=42 process-recycle protocol restarts with a clean heap (zero
       fragmentation: the leaf re-runs right after the stack upload) and
       the marker forces gram;
    4. three marked OOMs mean the leaf cannot fit even under the best
       conditions — re-raise the real error.

    The marker generalizes by SHAPE: flakiness at the residency margin is
    [out, in]-shape physics, so once one 11008x4096 leaf has proven the
    exact backend unsafe, every later same-shape leaf goes straight to
    gram (``oom_shapes``, persisted in the marker record) — the scan pays
    at most one recycle per novel shape instead of one per leaf.
    """
    in_oom_shape = oom_shapes is not None and shape in oom_shapes
    marked = bool(oom_counts.get(name)) or in_oom_shape
    # marked leaves/shapes get BOTH safety levers from the start: the
    # low-workspace gram backend AND single-candidate streaming chunks
    # (the auto backend already resolves to gram at the canonical MLP
    # shapes, so the chunk shrink is the lever that actually frees HBM).
    # shrink >= 8 additionally moves the gram EIGENDECOMPOSITION to the
    # host (_grid_eval_streamed -> gram_truncated_svd_host_eigh) — the
    # last resort once repeated clean-heap recycles prove the on-device
    # eigh workspace itself does not fit.
    shrink = 1 if not marked else (8 if oom_counts.get(name, 0) >= 4 else 4)
    try:
        return call("gram" if marked else None, shrink)
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        log.warning("device HBM OOM at %s (marked=%s) — retrying "
                    "in-process: gram backend + shrunk chunks",
                    name, marked)
        try:
            # residency post-mortem: what exactly is live on device
            live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
            log.warning("live device arrays: %.2f GB in %d buffers; top: %s",
                        sum(a.nbytes for a in live) / 2.0 ** 30, len(live),
                        ", ".join(f"{tuple(a.shape)}/{a.dtype.name}"
                                  f"={a.nbytes / 2.0 ** 20:.0f}MB"
                                  for a in live[:8]))
        except Exception:
            pass
        if shape is not None and oom_shapes is not None:
            if tuple(shape) not in oom_shapes and resume:
                # count-0 marker: records the unsafe SHAPE without
                # counting against the leaf's 3-strike fatal limit
                _append_oom(resume, name, 0, shape)
            oom_shapes.add(tuple(shape))
        try:
            return call("gram", 4)
        except Exception as e2:
            if "RESOURCE_EXHAUSTED" not in str(e2):
                raise
            n_oom = oom_counts.get(name, 0) + 1
            oom_counts[name] = n_oom
            if resume:
                _append_oom(resume, name, n_oom, shape)
            if n_oom >= 5:
                raise
            from asvd4llm_tpu.utils.hostguard import HostBudgetExceeded
            raise HostBudgetExceeded(
                f"device HBM OOM at {name} (gram retry; marked {n_oom}x) — "
                "recycling the process for an unfragmented heap") from e2


def _resolve_backend(cfg, out_f, in_f, max_rank):
    """Resolve the SVD backend EAGERLY, at dispatch time, before entering
    the jitted evaluators (_recompose_stack / _grid_factors take it as a
    static arg). This includes the memory-tight exact→gram fallback:
    resolving inside the trace would freeze a residency snapshot into the
    compiled program, which the jit cache then reuses at whatever
    residency comes later (ADVICE r4 medium #1)."""
    from asvd4llm_tpu.ops.svd import resolve_backend
    return resolve_backend(out_f, in_f, max_rank, cfg.svd_backend)


def _prep_grid_candidates(leaf, grid, cfg, scale, sub, mesh):
    """Shared candidate prep for the batched evaluators: one SVD at the
    grid's max rank, every valid ratio's dense recomposition stacked on a
    leading candidate axis (dp-sharded over the mesh when present).
    Returns (valid_ratios, w_hats, finite) — w_hats is None if no ratio
    yields a positive rank."""
    out_f, in_f = leaf_shape(leaf)
    ranks = {r: min(rank_for_param_ratio(in_f, out_f, r, cfg.rank_align),
                    in_f, out_f) for r in grid}
    valid = [r for r in grid if ranks[r] > 0]
    if not valid:
        return valid, None, None
    backend = _resolve_backend(cfg, out_f, in_f, max(ranks.values()))
    scale_vec = scale if scale is not None else jnp.ones((in_f,), jnp.float32)
    ranks_tuple = tuple(ranks[r] for r in valid)
    if mesh is not None and mesh.shape.get("dp", 1) > 1:
        # pad the candidate axis to a dp multiple so the grid always
        # shards (the 6-point weight grid on dp=4/8 used to silently
        # fall back to replication); padded slots re-evaluate the
        # last rank and are dropped by the caller's zip(valid, ...)
        dp = mesh.shape["dp"]
        pad = (-len(ranks_tuple)) % dp
        if pad:
            log.info("dp-sharding: padding %d candidates to %d (dp=%d)",
                     len(ranks_tuple), len(ranks_tuple) + pad, dp)
        ranks_tuple = ranks_tuple + (ranks_tuple[-1],) * pad
    w_hats, finite = _recompose_stack(leaf["w"], scale_vec, ranks_tuple,
                                      backend, sub)
    if mesh is not None and mesh.shape.get("dp", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        w_hats = jax.device_put(
            w_hats, NamedSharding(mesh, P("dp", None, None)))
    return valid, w_hats, finite


def _grid_chunk_bytes(C, cand_bytes, resident_bytes, mesh):
    """Cap the batched evaluators' vmap width — budget math lives in
    utils/membudget.grid_chunk_candidates (single owner, tested against
    the round-4 OOM shapes); this wrapper only adds the mesh exemption
    (dp shards the candidate axis; chunking would break the sharding)."""
    if mesh is not None and mesh.shape.get("dp", 1) > 1:
        return C
    from asvd4llm_tpu.utils.membudget import grid_chunk_candidates
    return grid_chunk_candidates(C, cand_bytes, resident_bytes)


def _grid_eval_streamed(leaf, grid, cfg, scale, sub, mesh, resident_bytes,
                        eval_fn, force_backend=None, chunk_shrink=1,
                        spill_hook=None):
    """Evaluate a leaf's whole ratio grid, streaming dense candidate
    recompositions through HBM in residency-sized chunks.

    dp>1 meshes keep the full-stack path (the candidate axis shards over
    dp). Otherwise the SVD factors stay resident ((out+in)·max_rank f32)
    and each chunk recomposes, evaluates, and frees — the per-chunk
    np.asarray fetch is the synchronization that bounds live chunks to
    one. ``force_backend`` overrides the auto SVD-backend resolution and
    ``chunk_shrink`` divides the planned chunk width (the device-OOM
    recovery ladder forces "gram" and shrinks chunks — at MLP shapes a
    full-width 6-candidate chunk is ~1.1 GB of transient, the entire
    planned headroom at canonical residency; see ``_grid_eval_oom_safe``).
    Returns (valid_ratios, ppls, finite) as numpy."""
    out_f, in_f = leaf_shape(leaf)
    ranks = {r: min(rank_for_param_ratio(in_f, out_f, r, cfg.rank_align),
                    in_f, out_f) for r in grid}
    valid = [r for r in grid if ranks[r] > 0]
    if not valid:
        return valid, None, None
    if mesh is not None and mesh.shape.get("dp", 1) > 1:
        valid, w_hats, finite = _prep_grid_candidates(
            leaf, grid, cfg, scale, sub, mesh)
        return valid, np.asarray(eval_fn(w_hats)), np.asarray(finite)
    backend = force_backend or _resolve_backend(cfg, out_f, in_f,
                                                max(ranks.values()))
    log.info("grid eval [%d, %d]: backend=%s resident=%.2f GB",
             out_f, in_f, backend, resident_bytes / 2.0 ** 30)
    scale_vec = scale if scale is not None else jnp.ones((in_f,),
                                                         jnp.float32)
    ranks_tuple = tuple(ranks[r] for r in valid)
    # marked leaves (chunk_shrink > 1): spill the cached prefix hiddens to
    # host for the duration of the SVD — ~540 MB freed at the exact point
    # the canonical run's clean-heap OOMs fire; restored (in place, so the
    # eval closure sees the new buffers) before the chunk loop needs them
    spilled = chunk_shrink > 1 and spill_hook is not None
    if spilled:
        spill_hook[0]()
    if backend == "gram" and chunk_shrink >= 8:
        # last-resort rung: host eigh (see _grid_eval_oom_safe docstring)
        from asvd4llm_tpu.ops.svd import gram_truncated_svd_host_eigh
        u, s, vh = gram_truncated_svd_host_eigh(
            leaf["w"], scale_vec, max(ranks_tuple))
        vh = vh / scale_vec[None, :]
    else:
        u, s, vh = _grid_factors(leaf["w"], scale_vec, ranks_tuple, backend,
                                 sub)
    if jax.default_backend() == "tpu":
        # HOST FETCH = the only reliable device sync on the axon backend
        # (block_until_ready does not wait). Buffers allocate at DISPATCH
        # time, so without this the recompose chunk's outputs allocate
        # while the SVD still holds its ~0.5-1 GB workspace — that
        # dispatch-execution overlap is what OOMed the full-depth run
        # at <300 MB of planned headroom. (u, not s: the host-eigh rung
        # derives s on the host, so only u tracks device progress.)
        float(u[0, 0])
    if spilled:
        spill_hook[1]()
    dtype = leaf["w"].dtype
    cand_bytes = out_f * in_f * dtype.itemsize
    cs = _grid_chunk_bytes(
        len(valid), cand_bytes,
        resident_bytes + u.nbytes + s.nbytes + vh.nbytes, mesh)
    cs = max(1, cs // max(1, chunk_shrink))
    ppls, fins = [], []
    for i in range(0, len(valid), cs):
        wh, fin = _recompose_chunk(u, s, vh, ranks_tuple[i:i + cs], dtype)
        ppls.append(np.asarray(eval_fn(wh)))    # sync: chunk freed before
        fins.append(np.asarray(fin))            # the next one dispatches
    return valid, np.concatenate(ppls), np.concatenate(fins)


def _scan_suffix_sensitivity(params, spec, input_ids, grid, cfg, *,
                             stats, fisher, mesh, include_extras,
                             timings=None, stacked=None,
                             free_stacked=False, resume=None,
                             max_rss_gb=None) -> dict:
    """Layer-major scan driver (uniform all-dense models): walks layers in
    order, keeps the dense model's hidden at the current layer's input
    cached on device, and scores each leaf's whole ratio grid with the
    prefix-cached suffix evaluator — every candidate pays only the
    layers-from-target suffix (half the full forward on average) plus the
    head. lm_head grid points reuse the final hidden and cost one head
    GEMM each. Numerically identical to the reference's full-forward
    rescan (the prefix of a single-layer trial IS the dense prefix)."""
    from asvd4llm_tpu.models.registry import (
        LM_HEAD_NAME, extra_linear_names, layer_linear_keys, linear_name,
    )
    from asvd4llm_tpu.models.scan_forward import (
        slice_stacked_weight, stack_layers, stacked_num_layers,
    )

    # Per-leaf resume (utils/hostguard.py): a recycled/killed process
    # reloads finished leaves and re-plays only the cheap prefix advances
    # (one dense layer per row block — ~1% of a leaf's grid cost).
    resume_state, oom_counts, oom_shapes = (
        _load_resume(resume) if resume else ({}, {}, set()))
    if resume_state:
        expected = [linear_name(spec, li, k)
                    for li in range(len(params["layers"]))
                    for k in layer_linear_keys(spec)]
        if include_extras:
            expected += list(extra_linear_names(params, spec))
        if all(n in resume_state for n in expected):
            log.info("sensitivity resume: all %d leaves cached in %s — "
                     "skipping the scan", len(expected), resume)
            out = {}
            for n in expected:
                r_li, r_dt, ratios = resume_state[n]
                out[n] = dict(ratios)
                if timings is not None:
                    timings.append((n, r_li, r_dt))
            if free_stacked and stacked is not None:
                for leaf in jax.tree.leaves(stacked):
                    leaf.delete()
            return out
        log.info("sensitivity resume: %d leaves cached in %s",
                 len(resume_state), resume)

    if stacked is None:
        t_st = time.time()
        stacked = stack_layers(params, spec)
        jax.block_until_ready(jax.tree.leaves(stacked)[:1])
        log.info("scan: stacked weights uploaded (%.1fs)",
                 time.time() - t_st)
    # slim head-params: everything but the per-layer leaves. The jitted
    # evaluators only touch embeddings / norms / head — passing the full
    # params would re-upload host-resident layer masters on EVERY call in
    # host-master residency mode (models/hostmem.py), and needlessly pin a
    # duplicate per-layer copy as jit args otherwise.
    hp = {k: v for k, v in params.items() if k != "layers"}
    limit = min(cfg.n_calib_samples, input_ids.shape[0])
    rows_np = np.asarray(input_ids[:limit])
    n, S = rows_np.shape
    # fixed-size row blocks with a masked remainder: program shapes are
    # independent of n_calib (see _row_block / module comment above)
    rb = _row_block(n, S)
    n_pad = -(-n // rb) * rb
    if n_pad > n:
        rows_np = np.concatenate(
            [rows_np, np.zeros((n_pad - n, S), rows_np.dtype)])
    valid_rows = (np.arange(n_pad) < n).astype(np.float32)
    t_em = time.time()
    h_blocks, l_blocks, m_blocks = [], [], []
    for i in range(0, n_pad, rb):
        blk = jnp.asarray(rows_np[i:i + rb])
        h_blocks.append(_embed_rows(hp, spec, blk))
        l_blocks.append(blk[:, 1:])
        m_blocks.append(jnp.asarray(valid_rows[i:i + rb]))
    if jax.default_backend() == "tpu":
        float(h_blocks[-1][0, 0, 0])
        log.info("scan: %d row blocks embedded (%.1fs)",
                 len(h_blocks), time.time() - t_em)

    def resident_bytes():
        live = ([] if stacked is None else jax.tree.leaves(stacked)) \
            + jax.tree.leaves(hp)
        return sum(x.nbytes for x in live) + sum(h.nbytes for h in h_blocks)

    # OOM-marked leaves' SVDs run with the prefix hiddens spilled to host
    # (see _grid_eval_streamed spill_hook): idempotent both ways so a
    # retry after a mid-SVD OOM can spill again safely
    def _spill_blocks():
        for j, h in enumerate(h_blocks):
            if isinstance(h, jax.Array):
                host = np.asarray(h)
                h.delete()
                h_blocks[j] = host

    def _restore_blocks():
        for j, h in enumerate(h_blocks):
            if not isinstance(h, jax.Array):
                h_blocks[j] = jnp.asarray(h)

    _spill = (_spill_blocks, _restore_blocks)

    sensitivity: dict = {}
    key = jax.random.PRNGKey(cfg.seed)
    t0 = time.time()
    n_pts = 0
    L = stacked_num_layers(stacked)
    for li in range(L):
        for k in layer_linear_keys(spec):
            t_name = time.time()
            name = linear_name(spec, li, k)
            # split BEFORE the resume check so the RNG stream (and thus
            # the randomized-SVD draws) is identical whether a leaf is
            # recomputed or replayed from the resume file
            key, sub = jax.random.split(key)
            if name in resume_state:
                _rli, r_dt, ratios = resume_state[name]
                sensitivity[name] = dict(ratios)
                n_pts += len(ratios)
                if timings is not None:
                    timings.append((name, li, r_dt))
                continue
            # candidate weight sliced from the stack: no host re-upload,
            # and no dependence on per-layer device leaves
            leaf = {"w": slice_stacked_weight(stacked, k, li), "b": None}
            scale = build_scaling_vector(
                None if stats is None else stats.get(name),
                None if fisher is None else fisher.get(name), cfg.alpha)
            sensitivity[name] = {}
            valid, ppls, finite = _grid_eval_oom_safe(
                lambda fb, shrink: _grid_eval_streamed(
                    leaf, grid, cfg, scale, sub, mesh, resident_bytes(),
                    force_backend=fb, chunk_shrink=shrink,
                    spill_hook=_spill,
                    eval_fn=lambda wh: _blocks_ppl(n, (
                        _ppl_multi_ratio_suffix(hp, stacked, spec, h, lab, m,
                                                k, jnp.int32(li), wh)
                        for h, lab, m in zip(h_blocks, l_blocks, m_blocks)))),
                name, resume, oom_counts, leaf_shape(leaf), oom_shapes)
            for ratio in set(grid) - set(valid):
                sensitivity[name][ratio] = float("inf")
            for j, (ratio, ppl) in enumerate(zip(valid, ppls)):
                sensitivity[name][ratio] = float(ppl) if finite[j] \
                    else float("inf")
                n_pts += 1
            dt = time.time() - t_name
            if timings is not None:
                timings.append((name, li, dt))
            log.info("sensitivity %s done (%d pts, %.1fs elapsed)",
                     name, n_pts, time.time() - t0)
            if resume:
                _append_resume(resume, name, li, dt, sensitivity[name])
            if max_rss_gb is not None:
                # raises HostBudgetExceeded — state just persisted, the
                # supervisor restarts and resumes from the next leaf
                from asvd4llm_tpu.utils.hostguard import check
                check(max_rss_gb, name)
        # advance the cached prefix past this (dense) layer
        t_adv = time.time()
        h_blocks = [_advance_block(hp, stacked, spec, h, jnp.int32(li))
                    for h in h_blocks]
        if jax.default_backend() == "tpu":
            # host-fetch sync (see _grid_eval_streamed): the next leaf's
            # SVD must not dispatch while the advance still runs (the last
            # block syncs all — in-order execution on one device)
            float(h_blocks[-1][0, 0, 0])
            log.info("scan: prefix advanced past layer %d (%.1fs)",
                     li, time.time() - t_adv)

    if free_stacked and stacked is not None:
        # the extras stage (lm_head grid) never touches the decoder stack,
        # and at full 7B depth the head's candidate stack (6 x [32000,
        # 4096]) cannot coexist with the 13 GB stacked arrays. Callers
        # that opt in (pipeline host-master mode) del their reference
        # right after the scan anyway; deleting the buffers here moves
        # that point before the head grid.
        for leaf in jax.tree.leaves(stacked):
            leaf.delete()
        stacked = None

    if include_extras:
        for name in extra_linear_names(params, spec):
            t_name = time.time()
            key, sub = jax.random.split(key)
            if name in resume_state:
                _rli, r_dt, ratios = resume_state[name]
                sensitivity[name] = dict(ratios)
                n_pts += len(ratios)
                if timings is not None:
                    timings.append((name, -1, r_dt))
                continue
            leaf = get_linear(params, spec, name)
            scale = build_scaling_vector(
                None if stats is None else stats.get(name),
                None if fisher is None else fisher.get(name), cfg.alpha)
            sensitivity[name] = {}
            if name == LM_HEAD_NAME:
                valid, ppls, finite = _grid_eval_oom_safe(
                    lambda fb, shrink: _grid_eval_streamed(
                        leaf, grid, cfg, scale, sub, mesh, resident_bytes(),
                        force_backend=fb, chunk_shrink=shrink,
                        spill_hook=_spill,
                        eval_fn=lambda wh: _blocks_ppl(n, (
                            _ppl_head_grid(hp, spec, h, lab, m, wh,
                                           leaf["b"])
                            for h, lab, m in zip(h_blocks, l_blocks,
                                                 m_blocks)))),
                    name, resume, oom_counts, leaf_shape(leaf), oom_shapes)
                for ratio in set(grid) - set(valid):
                    sensitivity[name][ratio] = float("inf")
                for j, (ratio, ppl) in enumerate(
                        zip(valid, ppls if valid else [])):
                    sensitivity[name][ratio] = float(ppl) if finite[j] \
                        else float("inf")
                    n_pts += 1
            else:
                # OPT-350m project_in/out: before/after the whole decoder —
                # no suffix to save; serial full evals (2 leaves, tiny)
                leaves = _recomposed_dense_all_ratios(
                    leaf["w"], leaf["b"], grid, scale, cfg.rank_align,
                    cfg.svd_backend, sub)
                valid = [r for r in grid if leaves[r] is not None]
                for ratio in set(grid) - set(valid):
                    sensitivity[name][ratio] = float("inf")
                for ratio in valid:
                    trial = set_linear(params, spec, name, leaves[ratio])
                    sensitivity[name][ratio] = evaluate_perplexity(
                        trial, spec, input_ids, cfg.n_calib_samples)
                    n_pts += 1
            dt = time.time() - t_name
            if timings is not None:
                timings.append((name, -1, dt))
            log.info("sensitivity %s done (%d pts, %.1fs elapsed)",
                     name, n_pts, time.time() - t0)
            if resume:
                _append_resume(resume, name, -1, dt, sensitivity[name])
            if max_rss_gb is not None:
                from asvd4llm_tpu.utils.hostguard import check
                check(max_rss_gb, name)
    return sensitivity


def calib_sensitivity_ppl(params, spec, calib_loader, cfg, *, stats=None,
                          fisher=None, cache=None,
                          batch_ratios: bool | None = None,
                          mesh=None, timings=None, stacked=None,
                          free_stacked=False, resume=None,
                          max_rss_gb=None) -> dict:
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

    include_extras = getattr(cfg, "compress_all_linears", True)
    # scan-stacked evaluator: compiles O(1) in depth (decisive for 7B-class
    # models where the unrolled per-bucket compile costs minutes and scales
    # with layer count); requires a uniform all-dense model. With
    # device-resident per-layer leaves the stacked copy DUPLICATES the
    # decoder weights; models too large for that run in host-master
    # residency (models/hostmem.py: layers on host, the stack is the ONLY
    # device copy) — the pipeline offloads them before this point.
    from asvd4llm_tpu.models.hostmem import (
        DUPLICATE_BUDGET_BYTES, is_host_layers, layer_bytes,
    )
    from asvd4llm_tpu.models.scan_forward import can_scan
    use_scan_eval = batch_ratios and can_scan(params, spec)
    if (use_scan_eval and jax.default_backend() == "tpu"
            and stacked is None and not is_host_layers(params)):
        lb = layer_bytes(params)
        if 2 * lb > DUPLICATE_BUDGET_BYTES:
            log.warning(
                "duplicate decoder weights (%.1f GB x2) would exceed HBM "
                "and the caller did not offload to host-master residency "
                "(models/hostmem.py) — falling back to the unrolled "
                "evaluator (slower: no prefix-cached suffix)", lb / 2 ** 30)
            use_scan_eval = False
    if use_scan_eval:
        sensitivity = _scan_suffix_sensitivity(
            params, spec, input_ids, grid, cfg, stats=stats, fisher=fisher,
            mesh=mesh, include_extras=include_extras, timings=timings,
            stacked=stacked, free_stacked=free_stacked, resume=resume,
            max_rss_gb=max_rss_gb)
        if cache is not None:
            cache.save_json("sensitivity", cfg.sensitivity_key(), sensitivity)
        return sensitivity

    sensitivity: dict = {}
    names = [name for name, _ in iter_linears(params, spec, include_extras)]
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

            valid, w_hats, finite = _prep_grid_candidates(
                leaf, grid, cfg, scale, sub, mesh)
            for ratio in set(grid) - set(valid):
                sensitivity[name][ratio] = float("inf")
            if not valid:
                continue
            layer_idx, leaf_key = parse_linear_name(spec, name)
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
