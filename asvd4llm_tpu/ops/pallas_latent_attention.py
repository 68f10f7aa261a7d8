"""Fused latent-KV decode attention (flash-decoding over rank-dim latents).

One kernel per decode step computes, for a layer whose k/v projections are
low-rank, everything between the query projection and the output
projection, reading the latent caches exactly once:

  for each T-tile of the latent cache:
      K_tile   = tk_tile @ A_k^T          (up-projection, MXU)
      K_tile   = RoPE(K_tile)             (VPU, cos/sin tile)
      logits   = q · K_tile  (+softcap)   (MXU)
      online softmax update (m, l)        (VPU)
      s       += softmax_tile @ tv_tile   (absorbed V numerator, MXU)
  out_h = (s_h / l_h) @ A_v[g(h)]^T       (tiny final up-projection)

HBM traffic per step: T·(Rk + Rv) for the caches + the two up-projection
matrices once — the unfused XLA path reads the same but materializes the
full K [T, KV, hd] intermediate through HBM; here it lives tile-by-tile in
VMEM. GQA is handled by batching the q·K dot over KV-head groups.

Restrictions (asserted): rope positional encoding, no k-projection bias
(llama-family k_proj has none; the v bias is folded in outside the kernel
since softmax weights sum to 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _group_chunk(KV: int, rep: int) -> int:
    """KV-head groups folded into one BLOCK-DIAGONAL dot per chunk (see
    _qk_group_logits).

    Per-group dots are [rep, hd]-sized M — pure MXU dispatch latency (at
    MHA rep=1 that is 2*KV tiny dots per tile; measured ~3x off the HBM
    roofline, attn_micro_r4b). Folding gc groups costs gc x redundant
    FLOPs (multiplying the zero off-blocks) but the MXU is idle against
    the page copy anyway: at P=256, hd=128, H=32 one gc=8 chunk dot is
    ~17 MFLOP against a 2 MB page read — far under the copy time at any
    gc. Unlike the round-3 cross-dot fold this form slices k_flat by
    CONTIGUOUS columns (no row-concat copies) and the zero blocks make
    the output exact (no diagonal extraction), so the fold no longer
    regresses MHA. ASVD_ATTN_GC overrides for on-chip sweeps."""
    import os
    env = os.environ.get("ASVD_ATTN_GC")
    if env:
        return max(1, min(KV, int(env)))
    return min(KV, 8)


def _bd_mask(val, g, rep, hd):
    """Zero everything outside the [rep, hd] diagonal blocks of a
    [g*rep, g*hd] tile (row head-group == column kv-group)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * rep, g * hd), 0) // rep
    cols = jax.lax.broadcasted_iota(jnp.int32, (g * rep, g * hd), 1) // hd
    return jnp.where(rows == cols, val, 0.0)


def _qk_group_logits(q, k_flat, KV, rep, hd, TT):
    """Per-KV-group q·K logits via BLOCK-DIAGONAL folded dots.

    The obvious per-group loop runs KV separate [rep, hd] x [TT, hd] dots —
    each an M=rep MXU dot, pure latency (measured: the tile loop of small
    dots, not bandwidth, dominated every kernel variant ~3-7x off the HBM
    roofline). Instead fold gc groups into ONE dot by building a
    block-diagonal query operand qbd [gc*rep, gc*hd] (head row h only
    carries its own group's q values, zeros elsewhere): qbd @ kc^T with
    kc = k_flat[:, c0*hd:(c0+gc)*hd] — a CONTIGUOUS column slice, no
    copies — yields the exact [gc*rep, TT] logits in one MXU dispatch
    (the zero blocks kill every cross-group term).

    q [H, hd] f32; k_flat [TT, KV*hd] f32 -> logits [H, TT] f32."""
    gc = _group_chunk(KV, rep)
    blocks = []
    for c0 in range(0, KV, gc):
        g = min(gc, KV - c0)
        qc = q[c0 * rep:(c0 + g) * rep, :]               # [g*rep, hd]
        kc = k_flat[:, c0 * hd:(c0 + g) * hd]            # [TT, g*hd]
        if g > 1:
            qc = _bd_mask(jnp.concatenate([qc] * g, axis=1), g, rep, hd)
        blocks.append(jax.lax.dot_general(
            qc, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))         # [g*rep, TT]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _pv_group_numerator(p, v_flat, KV, rep, hd, TT):
    """Per-KV-group probs·V numerator, one dot per group chunk.

    The fold here cannot zero its inputs (p is dense over keys), so the
    [g*rep, g*hd] result carries garbage cross-group terms; mask them to
    the diagonal blocks and reduce the group axis — a [g*rep, g, hd]
    sublane reduction, ~g*H*hd VPU element ops per tile, trivia against
    the page copy.

    p [H, TT]; v_flat [TT, KV*hd] -> s [H, hd]."""
    gc = _group_chunk(KV, rep)
    blocks = []
    for c0 in range(0, KV, gc):
        g = min(gc, KV - c0)
        pc = p[c0 * rep:(c0 + g) * rep, :]               # [g*rep, TT]
        vc = v_flat[:, c0 * hd:(c0 + g) * hd]            # [TT, g*hd]
        res = jax.lax.dot_general(
            pc.astype(v_flat.dtype), vc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [g*rep, g*hd]
        if g > 1:
            res = _bd_mask(res, g, rep, hd)
            res = res.reshape(g * rep, g, hd).sum(axis=1)
        blocks.append(res)                               # [g*rep, hd]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _online_tile(q_ref, tk_ref, tv_ref, ak_ref, cos_ref, sin_ref,
                 m_ref, l_ref, s_ref, *, pos, k_pos0, TT, KV, rep, hd,
                 scale, softcap, sliding):
    """One flash-decoding tile update (shared by the flat and the paged
    kernel): up-project the latent tile, RoPE it, q·K, online softmax,
    absorbed-V numerator. `pos` is the (per-sequence) query position and
    `k_pos0` the absolute position of the tile's first key."""
    # 1) up-project latents to key space: [TT, Rk] @ [Rk, KV*hd]
    k_flat = jax.lax.dot_general(
        tk_ref[0], ak_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [TT, KV*hd]

    # 2) RoPE entirely in 2D (Mosaic-friendly): cos/sin arrive per tile;
    # rotate-half is per-head static slicing + concat
    halves = []
    for g in range(KV):
        a = k_flat[:, g * hd:g * hd + hd // 2]
        b = k_flat[:, g * hd + hd // 2:(g + 1) * hd]
        halves.append(-b)
        halves.append(a)
    k_rot = jnp.concatenate(halves, axis=1)              # [TT, KV*hd]
    # tile cos/sin across heads IN VMEM (shipping them pre-tiled from HBM
    # costs KV x redundant bandwidth and dominated the kernel at long T)
    cos_t = jnp.concatenate([cos_ref[:]] * KV, axis=1)
    sin_t = jnp.concatenate([sin_ref[:]] * KV, axis=1)
    k_flat = k_flat * cos_t + k_rot * sin_t

    # 3) q·K per KV group — chunked cross-dots (one MXU dot per group
    # chunk instead of KV small M=rep dots; see _qk_group_logits)
    q = q_ref[0].astype(jnp.float32)                     # [H, hd]
    logits = _qk_group_logits(q, k_flat, KV, rep, hd, TT) * scale
    if softcap > 0:
        logits = softcap * jnp.tanh(logits / softcap)

    # 4) causal (+ sliding) mask over absolute key positions
    k_pos = k_pos0 + jax.lax.broadcasted_iota(jnp.int32, (1, TT), 1)
    allow = k_pos <= pos
    if sliding > 0:
        allow &= k_pos > pos - sliding
    logits = jnp.where(allow, logits, -1e30)

    # 5) online softmax update
    m_prev = m_ref[:, 0]                                  # [H]
    m_new = jnp.maximum(m_prev, logits.max(axis=1))
    corr = jnp.exp(m_prev - m_new)                        # [H]
    p = jnp.exp(logits - m_new[:, None])                  # [H, TT]
    l_ref[:, 0] = l_ref[:, 0] * corr + p.sum(axis=1)
    m_ref[:, 0] = m_new

    # 6) absorbed-V numerator: [H, TT] @ [TT, Rv]
    s_tile = jax.lax.dot_general(
        p.astype(tv_ref.dtype), tv_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s_ref[:] = s_ref[:] * corr[:, None] + s_tile


def _kernel(pos_ref, q_ref, tk_ref, tv_ref, ak_ref, cos_ref, sin_ref,
            out_ref, m_ref, l_ref, s_ref,
            *, nT, TT, KV, rep, hd, scale, softcap, sliding):
    """Grid: (B, nT). Scratch m/l/s persist across the T dimension and are
    reset at ti == 0 (grid is sequential, row-major: all tiles of batch b
    run before batch b+1)."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    _online_tile(q_ref, tk_ref, tv_ref, ak_ref, cos_ref, sin_ref,
                 m_ref, l_ref, s_ref, pos=pos_ref[0, 0], k_pos0=ti * TT,
                 TT=TT, KV=KV, rep=rep, hd=hd, scale=scale, softcap=softcap,
                 sliding=sliding)

    # final normalize on the last tile (the A_v up-projection is tiny
    # and head-grouped; it runs outside the kernel)
    @pl.when(ti == nT - 1)
    def _():
        out_ref[0] = (s_ref[:] / l_ref[:, 0][:, None]).astype(out_ref.dtype)


def _paged_kernel(pt_ref, pos_ref, q_ref, tk_ref, tv_ref, ak_ref, cos_ref,
                  sin_ref, out_ref, m_ref, l_ref, s_ref,
                  *, nP, P, KV, rep, hd, scale, softcap, sliding):
    """Paged variant: grid (B, nP) over LOGICAL pages; the BlockSpec index
    maps already resolved logical -> physical pages through the prefetched
    page table, so tk_ref/tv_ref hold the right pool page. Per-sequence
    `pos` makes the batch ragged; pages past a sequence's length skip all
    compute (their page-table entries point at the reserved scratch page)."""
    b = pl.program_id(0)
    pi = pl.program_id(1)
    pos = pos_ref[b]

    @pl.when(pi == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    @pl.when(pi * P <= pos)      # live page for this sequence
    def _():
        _online_tile(q_ref, tk_ref, tv_ref, ak_ref, cos_ref, sin_ref,
                     m_ref, l_ref, s_ref, pos=pos, k_pos0=pi * P,
                     TT=P, KV=KV, rep=rep, hd=hd, scale=scale,
                     softcap=softcap, sliding=sliding)

    @pl.when(pi == nP - 1)
    def _():
        out_ref[0] = (s_ref[:] / l_ref[:, 0][:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "sliding",
                                             "kv_heads", "head_dim", "tt",
                                             "interpret"))
def _latent_attention_core(q_rot, tk, tv, a_k, cos_full, sin_full, pos, *,
                           scale, softcap, sliding, kv_heads, head_dim,
                           tt=256, interpret=False):
    """q_rot [B, H, hd] (already rotated), tk [B, T, Rk], tv [B, T, Rv],
    a_k [KV*hd, Rk], cos/sin [T, hd], pos scalar int ->
    s_norm [B, H, Rv] (softmax-weighted V-latent sums)."""
    B, H, hd = q_rot.shape
    T = tk.shape[1]
    Rk, Rv = tk.shape[2], tv.shape[2]
    KV = kv_heads
    rep = H // KV
    nT = _cdiv(T, tt)
    assert T % tt == 0, "caller pads T to the tile size"

    grid_spec = pl.GridSpec(
        grid=(B, nT),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),   # running max
            pltpu.VMEM((H, 1), jnp.float32),   # denom
            pltpu.VMEM((H, Rv), jnp.float32),  # numerator
        ],
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),             # pos
            pl.BlockSpec((1, H, hd), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),             # q
            pl.BlockSpec((1, tt, Rk), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),             # tk tile
            pl.BlockSpec((1, tt, Rv), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),             # tv tile
            pl.BlockSpec((KV * hd, Rk), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),             # A_k
            pl.BlockSpec((tt, hd), lambda b, t: (t, 0),
                         memory_space=pltpu.VMEM),             # cos tile
            pl.BlockSpec((tt, hd), lambda b, t: (t, 0),
                         memory_space=pltpu.VMEM),             # sin tile
        ],
        out_specs=pl.BlockSpec((1, H, Rv), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, nT=nT, TT=tt, KV=KV, rep=rep, hd=hd,
                          scale=scale, softcap=softcap, sliding=sliding),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Rv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (Rk * KV * hd + H * hd + H * Rv),
            bytes_accessed=tk.size * tk.dtype.itemsize
            + tv.size * tv.dtype.itemsize + a_k.size * a_k.dtype.itemsize,
            transcendentals=B * H * T,
        ),
        interpret=interpret,
    )(jnp.asarray([[pos]], jnp.int32), q_rot, tk, tv, a_k, cos_full,
      sin_full)


def _paged_dense_kernel(pt_ref, pos_ref, q_ref, k_ref, v_ref, out_ref,
                        m_ref, l_ref, s_ref,
                        *, nP, P, KV, rep, hd, scale, softcap, sliding,
                        v_latent):
    """Paged flash-decoding over a DENSE K page pool (K stored rotated, no
    up-projection): grid (B, nP) logical pages resolved through the
    prefetched page table. V is either dense pages [P, KV, hd] (numerator
    per head [H, hd]) or V-latent pages [P, Rv] (absorbed numerator
    [H, Rv], up-projected outside) — the latent-V-only serving mode."""
    b = pl.program_id(0)
    pi = pl.program_id(1)
    pos = pos_ref[b]
    H = KV * rep

    @pl.when(pi == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        s_ref[:] = jnp.zeros_like(s_ref)

    @pl.when(pi * P <= pos)
    def _():
        q = q_ref[0].astype(jnp.float32)                 # [H, hd]
        k_flat = k_ref[0].astype(jnp.float32).reshape(P, KV * hd)
        logits = _qk_group_logits(q, k_flat, KV, rep, hd, P) * scale
        if softcap > 0:
            logits = softcap * jnp.tanh(logits / softcap)
        k_pos = pi * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        allow = k_pos <= pos
        if sliding > 0:
            allow &= k_pos > pos - sliding
        logits = jnp.where(allow, logits, -1e30)

        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, logits.max(axis=1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, None])             # [H, P]
        l_ref[:, 0] = l_ref[:, 0] * corr + p.sum(axis=1)
        m_ref[:, 0] = m_new

        if v_latent:
            s_tile = jax.lax.dot_general(                # [H, Rv]
                p.astype(v_ref.dtype), v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            v_flat = v_ref[0].reshape(P, KV * hd)
            s_tile = _pv_group_numerator(p, v_flat, KV, rep, hd, P)
        s_ref[:] = s_ref[:] * corr[:, None] + s_tile

    @pl.when(pi == nP - 1)
    def _():
        out_ref[0] = (s_ref[:] / l_ref[:, 0][:, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "sliding",
                                             "kv_heads", "head_dim",
                                             "interpret"))
def _paged_dense_core(q_rot, k_pool, v_pool, page_table, positions, *,
                      scale, softcap, sliding, kv_heads, head_dim,
                      interpret=False):
    """Dense-K paged flash-decoding core. k_pool [NP, P, KV, hd] (already
    rotated at write time); v_pool [NP, P, KV, hd] dense or [NP, P, Rv]
    V-latents. Returns [B, H, hd] (dense V) or [B, H, Rv] (latent V)."""
    B, H, hd = q_rot.shape
    KV = kv_heads
    rep = H // KV
    P = k_pool.shape[1]
    MP = page_table.shape[1]
    v_latent = v_pool.ndim == 3
    SV = v_pool.shape[2] if v_latent else hd

    # Logical pages past a sequence's length clamp to its LAST live page:
    # consecutive grid steps then resolve to the same block and the
    # pipeline skips the re-fetch, so ragged batches stop paying one
    # scratch-page DMA per (trailing page, layer, step) — on the serving
    # mix (prompts 256..4032, MP sized to the longest row) that waste was
    # ~half of all page reads. Compute for those steps is already gated
    # by `pl.when(pi * P <= pos)`.
    def _pg(b, p, pt, pos, _P=P):
        return pt[b, jnp.minimum(p, pos[b] // _P)]

    v_spec = pl.BlockSpec((1, P, v_pool.shape[2]),
                          lambda b, p, pt, pos: (_pg(b, p, pt, pos), 0, 0)) \
        if v_latent else \
        pl.BlockSpec((1, P, KV, hd),
                     lambda b, p, pt, pos: (_pg(b, p, pt, pos), 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, SV), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, p, pt, pos: (b, 0, 0)),
            pl.BlockSpec((1, P, KV, hd),
                         lambda b, p, pt, pos: (_pg(b, p, pt, pos), 0, 0, 0)),
            v_spec,
        ],
        out_specs=pl.BlockSpec((1, H, SV), lambda b, p, pt, pos: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_paged_dense_kernel, nP=MP, P=P, KV=KV, rep=rep,
                          hd=hd, scale=scale, softcap=softcap,
                          sliding=sliding, v_latent=v_latent),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, SV), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(page_table, positions, q_rot, k_pool, v_pool)


def paged_dense_decode_attention(q_rot, k_pool, v_pool, page_table,
                                 positions, *, kv_heads, scale, softcap=0.0,
                                 sliding=0, a_v=None, v_bias=None,
                                 interpret=False):
    """Paged flash-decoding with dense K pages. With dense V pages returns
    [B, H*hd] directly; with V-latent pages (a_v given) the absorbed
    numerator is up-projected per kv group like the full-latent path."""
    B, H, hd = q_rot.shape
    KV = kv_heads
    rep = H // KV
    out = _paged_dense_core(
        q_rot, k_pool, v_pool, jnp.asarray(page_table, jnp.int32),
        jnp.asarray(positions, jnp.int32), scale=scale, softcap=softcap,
        sliding=sliding, kv_heads=KV, head_dim=hd, interpret=interpret)
    if v_pool.ndim == 4:                                 # dense V
        if v_bias is not None:
            # softmax weights sum to 1, so the V bias adds per kv group
            vb = v_bias.reshape(KV, hd).astype(jnp.float32)
            out = (out.reshape(B, KV, rep, hd) + vb[None, :, None, :]
                   ).reshape(B, H, hd)
        return out.reshape(B, H * hd)
    Rv = v_pool.shape[2]
    a_v3 = a_v.reshape(KV, hd, Rv)
    sg = out.reshape(B, KV, rep, Rv)
    y = jnp.einsum("bgrv,gdv->bgrd", sg, a_v3.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    if v_bias is not None:
        vb = v_bias.reshape(KV, hd).astype(jnp.float32)
        y = y + vb[None, :, None, :]
    return y.reshape(B, H * hd)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "sliding",
                                             "kv_heads", "head_dim",
                                             "interpret"))
def _paged_latent_core(q_rot, tk_pool, tv_pool, a_k, cos_full, sin_full,
                       page_table, positions, *, scale, softcap, sliding,
                       kv_heads, head_dim, interpret=False):
    """Paged flash-decoding core: the page table rides as a SCALAR-PREFETCH
    operand, so each grid step's BlockSpec index map resolves logical page
    (b, p) to physical pool page page_table[b, p] — the kernel streams
    exactly the pages each sequence owns, never gathering the pool to a
    [B, T] copy in HBM (the XLA fallback in serving/paged.py does, costing
    2x cache traffic).

    q_rot [B, H, hd]; tk_pool [NP, P, Rk]; tv_pool [NP, P, Rv];
    page_table [B, MP] int32; positions [B] int32 (ragged);
    cos/sin [MP*P, hd] -> s_norm [B, H, Rv]."""
    B, H, hd = q_rot.shape
    KV = kv_heads
    rep = H // KV
    P = tk_pool.shape[1]
    MP = page_table.shape[1]
    Rk, Rv = tk_pool.shape[2], tv_pool.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MP),
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((H, Rv), jnp.float32),
        ],
        in_specs=[
            # trailing logical pages clamp to the row's last live page so
            # the pipeline elides their DMAs (see _paged_dense_core)
            pl.BlockSpec((1, H, hd), lambda b, p, pt, pos: (b, 0, 0)),
            pl.BlockSpec((1, P, Rk), lambda b, p, pt, pos:
                         (pt[b, jnp.minimum(p, pos[b] // P)], 0, 0)),
            pl.BlockSpec((1, P, Rv), lambda b, p, pt, pos:
                         (pt[b, jnp.minimum(p, pos[b] // P)], 0, 0)),
            pl.BlockSpec((KV * hd, Rk), lambda b, p, pt, pos: (0, 0)),
            pl.BlockSpec((P, hd), lambda b, p, pt, pos:
                         (jnp.minimum(p, pos[b] // P), 0)),
            pl.BlockSpec((P, hd), lambda b, p, pt, pos:
                         (jnp.minimum(p, pos[b] // P), 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Rv), lambda b, p, pt, pos: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_paged_kernel, nP=MP, P=P, KV=KV, rep=rep, hd=hd,
                          scale=scale, softcap=softcap, sliding=sliding),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Rv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(page_table, positions, q_rot, tk_pool, tv_pool, a_k,
      cos_full.astype(jnp.float32), sin_full.astype(jnp.float32))


def paged_latent_decode_attention(q_rot, tk_pool, tv_pool, a_k, a_v,
                                  cos_full, sin_full, page_table, positions,
                                  *, kv_heads, scale, softcap=0.0, sliding=0,
                                  v_bias=None, interpret=False):
    """Paged counterpart of latent_decode_attention: latents live in a page
    pool indexed through page_table, positions are per-sequence (ragged).
    Returns attention output [B, H*hd] (pre-o_proj)."""
    B, H, hd = q_rot.shape
    KV = kv_heads
    rep = H // KV
    Rv = tv_pool.shape[2]

    s_norm = _paged_latent_core(
        q_rot, tk_pool, tv_pool, a_k, cos_full, sin_full,
        jnp.asarray(page_table, jnp.int32), jnp.asarray(positions, jnp.int32),
        scale=scale, softcap=softcap, sliding=sliding, kv_heads=KV,
        head_dim=hd, interpret=interpret)                   # [B, H, Rv]

    a_v3 = a_v.reshape(KV, hd, Rv)
    sg = s_norm.reshape(B, KV, rep, Rv)
    out = jnp.einsum("bgrv,gdv->bgrd", sg, a_v3.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if v_bias is not None:
        vb = v_bias.reshape(KV, hd).astype(jnp.float32)
        out = out + vb[None, :, None, :]
    return out.reshape(B, H * hd)


def paged_latent_decode_attention_tp(q_rot, tk_pool, tv_pool, a_k, a_v,
                                     cos_full, sin_full, page_table,
                                     positions, mesh, *, kv_heads, scale,
                                     softcap=0.0, sliding=0, v_bias=None,
                                     interpret=False):
    """Tensor-parallel paged flash-decoding via shard_map: kv heads shard
    over the mesh's tp axis (each shard runs the kernel on its KV/tp heads
    with the REPLICATED latent pools — the latents are head-agnostic rank
    vectors, so no collective is needed until o_proj's row-parallel psum).
    q [B, H, hd] must be head-sharded on tp; A_k/A_v row-sharded; output is
    [B, H*hd] head-sharded on the feature dim. Requires KV % tp == 0."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["tp"]
    KV = kv_heads
    assert KV % tp == 0, (KV, tp)

    def local(q_l, ak_l, av_l, vb_l, tk, tv, pt, pos):
        vb = None if v_bias is None else vb_l
        return paged_latent_decode_attention(
            q_l, tk, tv, ak_l, av_l, cos_full, sin_full, pt, pos,
            kv_heads=KV // tp, scale=scale, softcap=softcap,
            sliding=sliding, v_bias=vb, interpret=interpret)

    vb_arg = jnp.zeros((KV * q_rot.shape[2],), jnp.float32) \
        if v_bias is None else v_bias
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "tp", None), P("tp", None), P("tp", None),
                  P("tp"), P(), P(), P(), P()),
        out_specs=P(None, "tp"),
        check_rep=False,
    )(q_rot, a_k, a_v, vb_arg, tk_pool, tv_pool,
      jnp.asarray(page_table, jnp.int32), jnp.asarray(positions, jnp.int32))


def latent_decode_attention(q_rot, tk, tv, a_k, a_v, cos_full, sin_full,
                            pos, *, kv_heads, scale, softcap=0.0, sliding=0,
                            v_bias=None, tt=1024, interpret=False):
    """Full fused latent attention for one decode step.

    q_rot [B, H, hd] rotated query; tk/tv [B, T, R*] latent caches;
    a_k [KV*hd, Rk], a_v [KV*hd, Rv] (the low-rank A factors);
    returns attention output [B, H*hd] (pre-o_proj)."""
    B, H, hd = q_rot.shape
    KV = kv_heads
    rep = H // KV
    T = tk.shape[1]
    Rk, Rv = tk.shape[2], tv.shape[2]
    tt = min(tt, _round_up(T, 128))

    # pad T to the tile size (masked out by the causal mask as long as
    # pos < true T, which init_caches guarantees)
    Tp = _round_up(T, tt)
    if Tp != T:
        tk = jnp.pad(tk, ((0, 0), (0, Tp - T), (0, 0)))
        tv = jnp.pad(tv, ((0, 0), (0, Tp - T), (0, 0)))
        cos_full = jnp.pad(cos_full, ((0, Tp - T), (0, 0)))
        sin_full = jnp.pad(sin_full, ((0, Tp - T), (0, 0)))

    s_norm = _latent_attention_core(
        q_rot, tk, tv, a_k, cos_full.astype(jnp.float32),
        sin_full.astype(jnp.float32), pos, scale=scale,
        softcap=softcap, sliding=sliding, kv_heads=KV, head_dim=hd, tt=tt,
        interpret=interpret)                                # [B, H, Rv]

    # final V up-projection, head-grouped: out_h = s_h @ A_v[g(h)]^T —
    # contracted per kv group, never materializing the repeated A_v
    a_v3 = a_v.reshape(KV, hd, Rv)
    sg = s_norm.reshape(B, KV, rep, Rv)
    out = jnp.einsum("bgrv,gdv->bgrd", sg, a_v3.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    if v_bias is not None:
        vb = v_bias.reshape(KV, hd).astype(jnp.float32)
        out = out + vb[None, :, None, :]
    return out.reshape(B, H * hd)
