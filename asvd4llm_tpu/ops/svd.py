"""Truncated SVD backends for TPU.

The reference leans on cuSOLVER via ``torch.svd_lowrank`` (ref:
modules/svd_linear.py:65). On TPU the two viable shapes are:

- exact: ``jnp.linalg.svd`` then truncate — fine for small/medium layers,
  O(mn*min(m,n)) on the scalar/vector units, slow for 4096x11008 MLPs;
- randomized subspace iteration (Halko et al., the same algorithm family
  as ``torch.svd_lowrank``): all the heavy work is GEMMs + thin QR, which
  is exactly what the MXU wants. We run it in float32 (bf16 loses too much
  for the downstream PPL parity target).

Both return ``(U, S, Vh)`` with ``U: [m, k]``, ``S: [k]``, ``Vh: [k, n]``
so that ``w ≈ U @ diag(S) @ Vh``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gram_truncated_svd(w: jax.Array, rank: int):
    """Truncated SVD via the [min, min] Gram eigendecomposition (m >= n).

    Accuracy: squares the condition number — singular values below
    ~sqrt(eps)*s_max (~3e-4 relative in f32) lose precision, but the
    factors feed a truncation that discards the small singular directions
    anyway. Error bound pinned by tests/test_asvd_math.py and measured at
    the real 32000x4096 head shape in svd_accuracy_r3.json."""
    c = w.T @ w                          # [n, n]
    s2, v = jnp.linalg.eigh(c)           # ascending
    s2 = s2[::-1]
    v = v[:, ::-1]
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    u = (w @ v) / jnp.maximum(s, 1e-12)[None, :]
    return u[:, :rank], s[:rank], v.T[:rank, :]


@jax.jit
def _gram_svd_full(w: jax.Array):
    """Full min-dim factorization via the Gram path, either orientation.
    One compiled program per weight shape (same compile-cache discipline
    as the exact path). Workspace is O(min(m,n)^2) f32 plus the [m, n]
    input/output pair — ~0.6 GB at 11008x4096 vs the multi-GB QDWH-SVD
    workspace of jnp.linalg.svd, which is what OOMed the full-depth
    32-layer scan next to its 13.6 GB resident working set."""
    w = w.astype(jnp.float32)
    m, n = w.shape
    if m >= n:
        return _gram_truncated_svd(w, n)
    u, s, vh = _gram_truncated_svd(w.T, m)
    return vh.T, s, u.T


def gram_truncated_svd_lowmem(w: jax.Array, scale: jax.Array, rank: int,
                              block: int = 1376):
    """Rank-sliced, row-blocked Gram SVD of ``w * scale[None, :]`` for use
    INSIDE jitted callers at the full-depth scan's HBM margin.

    Same math as ``_gram_svd_full`` (f32 Gram + eigh), but it never
    materializes the f32 scaled matrix (180 MB at 11008x4096 — the Gram
    accumulates over ``block``-row f32 slices, ~22 MB each) nor the
    full-width u (another 180 MB — the back-multiply uses only the top
    ``rank`` eigenvectors). The round-5 canonical run OOMed REPEATEDLY
    inside the grid eval's gram SVD at 13.05 GB resident, clean heap,
    where the peak-transient difference (~360 MB) is decisive. Blocked
    f32 summation reassociates adds vs the single-dot path (tiny, ~1e-7
    relative on the Gram entries); eigh and the truncation are identical.

    Returns ``(u, s, vh)`` of the SCALED matrix, sliced to ``rank``."""
    m, n = w.shape
    tall = m >= n
    k = min(m, n)

    def f32_row(i0, sz):
        # one [sz, n] f32 slice of w*scale, built on the fly
        blk = jax.lax.dynamic_slice_in_dim(w, i0, sz, 0).astype(jnp.float32)
        return blk * scale[None, :]

    c = jnp.zeros((k, k), jnp.float32)
    if tall:
        for i0 in range(0, m, block):
            sz = min(block, m - i0)
            blk = f32_row(i0, sz)
            c = c + blk.T @ blk
    else:
        # wide: Gram over columns, c = (w s)(w s)^T accumulated in
        # column blocks
        for j0 in range(0, n, block):
            sz = min(block, n - j0)
            blk = jax.lax.dynamic_slice_in_dim(w, j0, sz, 1).astype(
                jnp.float32) * scale[j0:j0 + sz][None, :]
            c = c + blk @ blk.T
    s2, v = jnp.linalg.eigh(c)                     # ascending
    s = jnp.sqrt(jnp.maximum(s2[::-1][:rank], 0.0))
    v_r = v[:, ::-1][:, :rank]                     # [k, rank]
    inv_s = 1.0 / jnp.maximum(s, 1e-12)
    if tall:
        # u = (w s) @ v_r / s, accumulated in row blocks
        rows = []
        for i0 in range(0, m, block):
            sz = min(block, m - i0)
            rows.append(f32_row(i0, sz) @ v_r)
        u = jnp.concatenate(rows, axis=0) * inv_s[None, :]
        return u, s, v_r.T
    # wide: eigenvectors are the LEFT singular vectors; vh = u^T (w s)/s
    u = v_r                                        # [m, rank]
    cols = []
    for j0 in range(0, n, block):
        sz = min(block, n - j0)
        blk = jax.lax.dynamic_slice_in_dim(w, j0, sz, 1).astype(
            jnp.float32) * scale[j0:j0 + sz][None, :]
        cols.append(u.T @ blk)
    vh = jnp.concatenate(cols, axis=1) * inv_s[:, None]
    return u, s, vh


@functools.partial(jax.jit, static_argnames=("block",))
def _gram_blocked(w: jax.Array, scale: jax.Array, block: int = 1376):
    """f32 Gram of ``w * scale[None, :]`` accumulated over blocks of the
    resident (bf16) weight — [min, min] output, never materializing the
    f32 scaled matrix. Tall: c = (ws)^T (ws); wide: c = (ws)(ws)^T."""
    m, n = w.shape
    k = min(m, n)
    c = jnp.zeros((k, k), jnp.float32)
    if m >= n:
        for i0 in range(0, m, block):
            sz = min(block, m - i0)
            blk = jax.lax.dynamic_slice_in_dim(w, i0, sz, 0).astype(
                jnp.float32) * scale[None, :]
            c = c + blk.T @ blk
    else:
        for j0 in range(0, n, block):
            sz = min(block, n - j0)
            blk = jax.lax.dynamic_slice_in_dim(w, j0, sz, 1).astype(
                jnp.float32) * scale[j0:j0 + sz][None, :]
            c = c + blk @ blk.T
    return c


@functools.partial(jax.jit, static_argnames=("block",))
def _blocked_right_mul(w: jax.Array, scale: jax.Array, v_r: jax.Array,
                       block: int = 1376):
    """(w * scale) @ v_r over row blocks — [m, rank] f32."""
    m, _ = w.shape
    rows = []
    for i0 in range(0, m, block):
        sz = min(block, m - i0)
        blk = jax.lax.dynamic_slice_in_dim(w, i0, sz, 0).astype(
            jnp.float32) * scale[None, :]
        rows.append(blk @ v_r)
    return jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("block",))
def _blocked_left_mul(w: jax.Array, scale: jax.Array, u_r: jax.Array,
                      block: int = 1376):
    """u_r^T @ (w * scale) over column blocks — [rank, n] f32."""
    _, n = w.shape
    cols = []
    for j0 in range(0, n, block):
        sz = min(block, n - j0)
        blk = jax.lax.dynamic_slice_in_dim(w, j0, sz, 1).astype(
            jnp.float32) * scale[j0:j0 + sz][None, :]
        cols.append(u_r.T @ blk)
    return jnp.concatenate(cols, axis=1)


def gram_truncated_svd_host_eigh(w: jax.Array, scale: jax.Array, rank: int,
                                 block: int = 1376):
    """LAST-RESORT gram SVD: the eigendecomposition runs on the HOST.

    Round-5 post-mortem (live-buffer dump at the OOM): 13.29 GB of the
    16 GB chip is the scan's resident working set, and even the
    low-memory gram form OOMs — jnp.linalg.eigh's QDWH workspace at
    [4096, 4096] is the last allocation that doesn't fit. This variant
    keeps only the blocked Gram and the rank-sliced back-multiply on
    device (~250 MB peak transient at 11008x4096) and fetches the 67 MB
    Gram to the host for numpy's ssyevd (~20-40 s on this VM's single
    core) — slow, but it turns a dead 3-hour run into a finished one.
    Eager only (host fetch inside): callers must NOT be under jit."""
    import numpy as np

    m, n = w.shape
    tall = m >= n
    c = np.asarray(_gram_blocked(w, scale, block=block))
    s2, v = np.linalg.eigh(c)                       # f32 ssyevd, ascending
    s_np = np.sqrt(np.clip(s2[::-1][:rank], 0.0, None))
    v_r = jnp.asarray(np.ascontiguousarray(v[:, ::-1][:, :rank]))
    s = jnp.asarray(s_np)
    inv_s = jnp.asarray(1.0 / np.maximum(s_np, 1e-12))
    if tall:
        u = _blocked_right_mul(w, scale, v_r, block=block) * inv_s[None, :]
        return u, s, v_r.T
    vh = _blocked_left_mul(w, scale, v_r, block=block) * inv_s[:, None]
    return v_r, s, vh


def exact_svd_fits_hbm(m: int, n: int) -> bool:
    """Whether jnp.linalg.svd's workspace for an [m, n] f32 matrix fits
    next to the CURRENTLY LIVE device arrays. All numbers (budget,
    workspace multiple, residency query incl. its loud failure mode) are
    owned by utils/membudget — the one tested home for memory planning.

    EAGER ONLY: under tracing the residency snapshot would be baked into
    the compiled program and reused from the jit cache at whatever
    residency comes later (a program first traced at low residency keeps
    running exact QDWH after the resident set grows — reintroducing the
    round-4 OOM). Jitted callers pre-resolve via ``resolve_backend``."""
    from asvd4llm_tpu.utils.membudget import exact_svd_fits_hbm as _fits
    return _fits(m, n)


def resolve_backend(m: int, n: int, rank: int, backend: str = "auto") -> str:
    """Eagerly resolve the SVD backend for an [m, n] matrix at ``rank``.

    This is the ONE entry point for the auto heuristic (measured 0.5
    boundary, see truncated_svd's docstring) plus the memory-tight
    exact→gram fallback. Callers that jit around truncated_svd MUST call
    this at dispatch time and pass the result as their static backend arg:
    resolving inside the trace would freeze a residency snapshot into the
    compiled program (ADVICE r4 medium #1)."""
    if backend == "auto":
        small = (m * n <= 1024 * 1024) or (rank >= 0.5 * min(m, n))
        backend = "exact" if small else "randomized"
    if backend == "exact" and not exact_svd_fits_hbm(m, n):
        # memory-tight regimes (the full-depth 32-layer scan keeps a
        # 13.6 GB working set resident; the final decompose holds the
        # growing compressed model) swap QDWH-SVD's multi-GB workspace
        # for the Gram path: accuracy within 0.7% of optimal at real
        # shapes (svd_accuracy_r3.json), workspace O(min^2)
        backend = "gram"
    return backend


@functools.partial(jax.jit, static_argnames=("rank",))
def _exact_truncated_svd(w: jax.Array, rank: int):
    """NOTE: jitted (static rank) so the compiled SVD lands in the
    PERSISTENT compilation cache — eager dispatches do not, and a cold
    process paid a ~340 s recompile per SVD shape through the TPU tunnel."""
    w = w.astype(jnp.float32)
    m, n = w.shape
    # VERY tall/wide matrices (the 32000x4096 lm_head) take the Gram path:
    # XLA's SVD decomposition program for the full matrix is so large that
    # compiling it OOM-kills the compile service; the Gram matrix keeps the
    # decomposition at [min, min]. The small-matrix exact path that the
    # parity tests pin is unchanged.
    if max(m, n) >= 4 * min(m, n) and max(m, n) >= 16384:
        if m >= n:
            return _gram_truncated_svd(w, rank)
        u, s, vh = _exact_truncated_svd(w.T, rank)
        return vh.T, s, u.T
    u, s, vh = jnp.linalg.svd(w, full_matrices=False)
    return u[:, :rank], s[:rank], vh[:rank, :]


@functools.partial(jax.jit, static_argnames=("rank", "niter"))
def randomized_svd(w: jax.Array, rank: int, *, key: jax.Array, niter: int = 8):
    """Randomized truncated SVD via subspace (power) iteration.

    Mirrors the structure of torch.svd_lowrank (sketch on the short side,
    ``niter`` power iterations with QR re-orthogonalization, small exact SVD
    of the projected matrix). We default to more iterations than torch's 2
    plus oversampling because the factors feed a perplexity-parity target,
    and the extra GEMMs are cheap on the MXU.
    """
    w = w.astype(jnp.float32)
    m, n = w.shape
    transposed = m < n
    a = w.T if transposed else w  # a: [M, N] with M >= N
    M, N = a.shape
    # oversample for accuracy, clamp to the small dimension
    q = min(rank + 8, N, M)

    omega = jax.random.normal(key, (N, q), dtype=jnp.float32)
    y = a @ omega                                  # [M, q]
    qmat, _ = jnp.linalg.qr(y)
    for _ in range(niter):
        z = a.T @ qmat                             # [N, q]
        zq, _ = jnp.linalg.qr(z)
        y = a @ zq
        qmat, _ = jnp.linalg.qr(y)
    b = qmat.T @ a                                 # [q, N] — small
    ub, s, vh = jnp.linalg.svd(b, full_matrices=False)
    u = qmat @ ub                                  # [M, q]
    u, s, vh = u[:, :rank], s[:rank], vh[:rank, :]
    if transposed:
        # w = a.T ≈ (U S Vh).T = Vh.T S U.T
        return vh.T, s, u.T
    return u, s, vh


def truncated_svd(w: jax.Array, rank: int, *, backend: str = "auto",
                  key: jax.Array | None = None, niter: int = 8):
    """Dispatch between exact, randomized, and Gram truncated SVD.

    ``backend``: "exact" | "randomized" | "gram" | "auto". "gram" is also
    chosen automatically over "exact" when the QDWH-SVD workspace would
    not fit next to the live device arrays (exact_svd_fits_hbm) — the
    full-depth 32-layer scan and the final decompose both run with >13 GB
    resident on a 16 GB chip. Auto uses the exact path
    when the matrix is small or the requested rank is a large fraction of
    the spectrum. The 0.5 threshold is MEASURED — re-measured WARM with
    compile excluded in benchmarks/results/svd_bench_r4.json (VERDICT r3
    #6, supersedes the conflated r3 timings): randomized is 4.6-4.7x
    faster at the 4096x4096 scan/deploy ranks (ratio 0.44-0.45) and 15.8x
    at KV-grade rank 512, with rel-err within 2e-4 of exact; at 11008x4096
    it wins 1.49x at ratio 0.656 but LOSES (0.89x) at deploy ratio 0.625 —
    the mlp regime near the boundary is noise-dominated (the 256-bucketed
    subspace flips which program runs), so the boundary stays at 0.5 where
    both measured mlp points are served correctly and the attn ranks that
    dominate the scan keep the 4.6x. Exact-always would forfeit that 4.6x;
    randomized-always would lose above the boundary AND at the tiny shapes
    where full exact is one fused program.

    Compile-cache discipline: the jitted programs are keyed on the STATIC
    rank, and each novel (shape, rank) costs a multi-minute compile +
    per-process load through this environment's TPU tunnel (measured in
    pipeline_bench_r3_small: the search phase paid ~145 s per fresh rank
    even with the scan's programs warm). The exact path therefore always
    decomposes at FULL rank (jnp.linalg.svd computes the full
    factorization anyway — slicing after is free and exact), giving ONE
    program per weight shape shared by scan, search and final decompose."""
    m, n = w.shape
    rank = int(min(rank, m, n))
    if isinstance(w, jax.core.Tracer):
        # under tracing, residency is a meaningless trace-time snapshot
        # that would be frozen into the compiled program (jit cache keys
        # on shapes/statics only) — the auto shape heuristic still
        # applies, but the exact→gram memory fallback must have been
        # pre-resolved by the caller (resolve_backend). auto-exact under
        # tracing is fine for the small shapes the heuristic picks it for.
        if backend == "auto":
            small = (m * n <= 1024 * 1024) or (rank >= 0.5 * min(m, n))
            backend = "exact" if small else "randomized"
    else:
        backend = resolve_backend(m, n, rank, backend)
    if backend == "gram":
        u, s, vh = _gram_svd_full(w)
        return u[:, :rank], s[:rank], vh[:rank, :]
    if backend == "exact":
        u, s, vh = _exact_truncated_svd(w, min(m, n))
        return u[:, :rank], s[:rank], vh[:rank, :]
    if backend == "randomized":
        if key is None:
            key = jax.random.PRNGKey(0)
        # bucket the subspace size to a 256 multiple: a handful of
        # programs per shape instead of one per distinct grid rank
        # (extra subspace only improves accuracy; result sliced to rank)
        rank_b = min(-(-rank // 256) * 256, m, n)
        u, s, vh = randomized_svd(w, rank_b, key=key, niter=niter)
        return u[:, :rank], s[:rank], vh[:rank, :]
    raise ValueError(f"unknown svd backend {backend!r}")


def batched_truncated_svd(ws: jax.Array, rank: int, *, backend: str = "auto",
                          key: jax.Array | None = None):
    """SVD a stack of same-shaped weights ``[L, m, n]`` in one vmapped call.

    This is what makes the sensitivity scan minutes instead of hours: the
    reference factorizes layer-by-layer serially (ref sensitivity.py:43-59);
    we bucket layers by shape and factorize each bucket in a single batched
    device computation.
    """
    L = ws.shape[0]
    m, n = ws.shape[1:]
    if backend == "auto":
        small = (m * n <= 1024 * 1024) or (rank >= 0.5 * min(m, n))
        backend = "exact" if small else "randomized"
    if backend == "exact" and not exact_svd_fits_hbm(L * m, n):
        backend = "gram"     # see truncated_svd: memory-tight fallback
    if backend == "gram":
        # the vmapped gram route materializes L*(Gram + eigh workspace +
        # full U/S/Vh) at once — it needs its own fit check (ADVICE r4):
        # chunk the batch serially when the full vmap would not fit
        from asvd4llm_tpu.utils.membudget import fits, \
            gram_svd_workspace_bytes
        bs = L
        while bs > 1 and not fits(bs * gram_svd_workspace_bytes(m, n)):
            bs = (bs + 1) // 2
        parts = [jax.vmap(_gram_svd_full)(ws[i:i + bs])
                 for i in range(0, L, bs)]
        us = jnp.concatenate([p[0] for p in parts])
        ss = jnp.concatenate([p[1] for p in parts])
        vhs = jnp.concatenate([p[2] for p in parts])
        return us[:, :, :rank], ss[:, :rank], vhs[:, :rank, :]
    if backend == "exact":
        us, ss, vhs = jax.vmap(
            lambda w: _exact_truncated_svd(w, min(m, n)))(ws)
        return us[:, :, :rank], ss[:, :rank], vhs[:, :rank, :]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, L)
    return jax.vmap(lambda w, k: randomized_svd(w, rank, key=k))(ws, keys)


def singular_values(w: jax.Array) -> jax.Array:
    """All singular values (no U/V), for the stable-rank sensitivity proxy
    (ref sensitivity.py:101)."""
    return jnp.linalg.svd(w.astype(jnp.float32), compute_uv=False)
