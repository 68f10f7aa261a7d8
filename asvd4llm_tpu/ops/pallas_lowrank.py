"""Fused two-stage low-rank matmul Pallas kernel.

Computes ``y = (x @ B.T) @ A.T + bias`` in ONE kernel with the rank-dim
intermediate ``t = x @ B.T`` resident in VMEM — the factored forward of
SVDLinear (ref modules/svd_linear.py:105-109) without the HBM round-trip
between the two GEMMs.

Execution shape (TPU grid is sequential on a core, so VMEM scratch
persists across steps):

  phase 1, steps g in [0, nk):   t += x[:, gTK:(g+1)TK] @ B[:, gTK:(g+1)TK].T
  phase 2, steps g in [nk, nk+nn): y[:, jTN:(j+1)TN] = t @ A[jTN:(j+1)TN].T + b

HBM traffic: x once, B once, A once, y once — the bandwidth roofline for
the op. The decode regime (small M, weights dominate traffic) is where
this beats the dense matmul whenever rank < K*N/(K+N), which the ASVD rank
formula guarantees for every compressed layer.

The public wrapper pads M/R/N/K to hardware tiles and falls back to the
XLA dot-dot path off-TPU or for prefill-sized M (compute-bound; XLA's own
pipelining is already optimal there).
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


def _pick_tile(dim_padded: int, cap: int):
    """Largest 128-multiple tile <= cap that DIVIDES dim_padded, or None.

    A dividing tile means the operand dispatches with NO runtime jnp.pad.
    That matters enormously in the serving decode step: weights are jit
    ARGUMENTS there, so a pad of the int8 code arrays re-copies the whole
    factor (read + write + kernel re-read) EVERY step — measured as the
    bulk of q8 serving's 29% roofline gap in round 4 (serving_bench_r4c:
    q8 at 71% of its ceiling while dense sat at 98%)."""
    top = min(cap, dim_padded)
    for t in range(top - top % 128, 127, -128):
        if dim_padded % t == 0:
            return t
    return None


def _pad2(arr, rows: int, cols: int):
    """Zero-pad a 2-D array up to [rows, cols]; Python no-op when already
    that shape (jit sees shapes statically, so the branch is free)."""
    r, c = arr.shape
    if r == rows and c == cols:
        return arr
    return jnp.pad(arr, ((0, rows - r), (0, cols - c)))


def _kernel(x_ref, b_ref, a_ref, bias_ref, y_ref, t_acc, *, nk, nn):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)

    @pl.when(g < nk)
    def _():
        # t += x_tile [M, TK] @ B_tile.T ([R, TK] -> [TK, R])
        t_acc[:] += jax.lax.dot_general(
            x_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(g >= nk)
    def _():
        # y_tile [M, TN] = t [M, R] @ A_tile.T ([TN, R] -> [R, TN]) + bias
        y = jax.lax.dot_general(
            t_acc[:].astype(a_ref.dtype), a_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[:] = (y + bias_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tk", "tn", "interpret"))
def _fused_2d(x, a, b, bias, *, tk=512, tn=512, interpret=False):
    """x: [M, K], a: [N, R], b: [R, K], bias: [N] -> y [M, N].
    All dims must already be padded to tile multiples."""
    M, K = x.shape
    N, R = a.shape
    nk, nn = _cdiv(K, tk), _cdiv(N, tn)

    grid_spec = pl.GridSpec(
        grid=(nk + nn,),
        scratch_shapes=[pltpu.VMEM((M, R), jnp.float32)],
        in_specs=[
            pl.BlockSpec((M, tk), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tk), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, R), lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk, nn=nn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * R * (K + N),
            bytes_accessed=(x.size + a.size + b.size) * x.dtype.itemsize
            + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, b, a, bias)


def _q8_kernel(x_ref, b_ref, bsc_ref, bzp_ref, a_ref, asc_ref, azp_ref,
               bias_ref, y_ref, t_acc, xs_acc, *, nk, nn):
    """Int8-factor variant: A/B stored as int8 codes + per-row (scale, zero)
    — HBM traffic is HALVED again vs bf16 factors.

    The MXU multiplies RAW codes in bf16 (int8 values are exact in bf16,
    and bf16xbf16 products accumulate in f32, so this is bit-identical to
    dequantize-then-f32-dot — which ran the MXU in its 4-8x slower f32
    mode, the round-2 kernel's main cost). Per-row dequant then folds into
    post-dot f32 corrections:
        t[m,r] = bsc[r] * (x @ codes.T)[m,r] - bsc[r]*bzp[r] * xsum[m]
    (one broadcast multiply and one rank-1 update on the VPU)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)
        xs_acc[:] = jnp.zeros_like(xs_acc)

    @pl.when(g < nk)
    def _():
        t_acc[:] += jax.lax.dot_general(
            x_ref[:], b_ref[:].astype(x_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xs_acc[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=1,
                             keepdims=True)

    @pl.when(g == nk)
    def _():
        # all K tiles accumulated: apply B's per-row dequant ONCE
        t_acc[:] = t_acc[:] * bsc_ref[:].T \
            - xs_acc[:] * (bsc_ref[:] * bzp_ref[:]).T

    @pl.when(g >= nk)
    def _():
        # the dot and its zero-point correction must see the SAME t: cast
        # once to the io dtype (matching the XLA dequant fallback, which
        # also runs the second GEMM at io precision)
        t_b = t_acc[:].astype(y_ref.dtype)
        y = jax.lax.dot_general(
            t_b, a_ref[:].astype(y_ref.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ts = jnp.sum(t_b.astype(jnp.float32), axis=1, keepdims=True)
        y = y * asc_ref[:].T - ts * (asc_ref[:] * azp_ref[:]).T
        y_ref[:] = (y + bias_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tk", "tn", "interpret"))
def _fused_2d_q8(x, a8, asc, azp, b8, bsc, bzp, bias, *, tk=512, tn=512,
                 interpret=False):
    """x [M,K] bf16/f32; a8 [N,R] int8 (+ per-row scale/zero [N,1]);
    b8 [R,K] int8 (+ [R,1]); bias [1,N]. All pre-padded."""
    M, K = x.shape
    N, R = a8.shape
    nk, nn = _cdiv(K, tk), _cdiv(N, tn)

    grid_spec = pl.GridSpec(
        grid=(nk + nn,),
        scratch_shapes=[pltpu.VMEM((M, R), jnp.float32),
                        pltpu.VMEM((M, 1), jnp.float32)],
        in_specs=[
            pl.BlockSpec((M, tk), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tk), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, R), lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_q8_kernel, nk=nk, nn=nn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * R * (K + N),
            bytes_accessed=a8.size + b8.size + x.size * x.dtype.itemsize
            + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, b8, bsc, bzp, a8, asc, azp, bias)


def _q4_kernel(x_ref, bq_ref, bs_ref, bzs_ref, aq_ref, as_ref, azs_ref,
               bias_ref, y_ref, t_acc, *, nk, nn, group, pack_tile):
    """Int4-factor variant. Codes are 4-bit, packed 2/byte with the
    tile-aware split-half layout (ops/quant.py pack_int4): unpacking a
    tile's low/high nibbles yields two CONTIGUOUS half-tiles, so no lane
    interleave is needed.

    Each tile is dequantized IN VMEM on the VPU (codes*scale - zero_scale,
    identical arithmetic to the XLA dequant oracle) and the MXU then runs
    ONE io-dtype dot per tile. Earlier revisions applied the group scales
    as post-dot rank-1 corrections, which forced one MXU dot PER 128-wide
    group — ~440 latency-bound small dots at 7B MLP shapes, measuring
    SLOWER than dense (0.66x) despite 1/4 the HBM bytes. The per-tile
    dequant is ~1M VPU ops per tile (tens of microseconds across the whole
    op) and restores the single-dot MXU shape of the bf16 kernel.

    Mosaic note: there is no uint8->bf16 cast and no i8-vector shift
    (arith.shrui on vector<i8> fails to legalize) — widen packed bytes to
    int32 FIRST, then shift/mask/cast; all exact for 4-bit codes."""
    g = pl.program_id(0)
    half = pack_tile // 2          # nibble-half width at PACK time (the
    ngh = half // group            # K/N grid tiles may span several)

    @pl.when(g == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)

    io_dtype = y_ref.dtype

    # dequant arithmetic dtype: bf16 io runs the VPU in bf16 (2x lane
    # throughput; codes 0..15 are exact in bf16 and scale rounding is far
    # below the 4-bit quantization noise); f32 io keeps exact f32 math so
    # the interpret-mode oracle tests match bit-for-bit
    dq_dtype = jnp.float32 if io_dtype == jnp.float32 else io_dtype

    @pl.when(g < nk)
    def _():
        # the K-tile may span several pack tiles (tk a multiple of the
        # pack col_tile): packed cols [pt*half, (pt+1)*half) hold pack
        # tile pt's lo/hi nibbles
        pk = bq_ref[:].astype(jnp.int32)         # [R, tk/2] u8 zero-extend
        lo = (pk & 15).astype(dq_dtype)
        hi = (pk >> 4).astype(dq_dtype)          # u8 source: already 0..15
        parts = []
        for k in range(pk.shape[1] * 2 // group):    # static unroll
            pt = (k * group) // pack_tile
            j = k % (pack_tile // group)
            nib = lo if j < ngh else hi
            c0 = pt * half + (j % ngh) * group
            codes = nib[:, c0:c0 + group]
            # B scales ride in the [nk, 8-padded group, R] tile layout
            # (Mosaic rejects an (R, tk/group) block when tk/group < 8
            # lanes); reshape in f32 BEFORE the cast (Mosaic only supports
            # minor-dim insertion on 32-bit types)
            parts.append(codes * bs_ref[0, k, :][:, None].astype(dq_dtype)
                         - bzs_ref[0, k, :][:, None].astype(dq_dtype))
        dq = jnp.concatenate(parts, axis=1).astype(io_dtype)   # [R, tk]
        t_acc[:] += jax.lax.dot_general(
            x_ref[:], dq,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(g >= nk)
    def _():
        pk = aq_ref[:].astype(jnp.int32)         # [TN, Rp/2] u8 zero-extend
        lo = (pk & 15).astype(dq_dtype)
        hi = (pk >> 4).astype(dq_dtype)
        R = t_acc.shape[1]
        parts = []
        for g2 in range(R // group):             # static unroll
            t_idx = (g2 * group) // pack_tile
            j = g2 % (pack_tile // group)
            nib = lo if j < ngh else hi
            c0 = t_idx * half + (j % ngh) * group
            codes = nib[:, c0:c0 + group]        # [TN, group]
            parts.append(codes * as_ref[:, g2][:, None].astype(dq_dtype)
                         - azs_ref[:, g2][:, None].astype(dq_dtype))
        dq = jnp.concatenate(parts, axis=1).astype(io_dtype)   # [TN, R]
        t_b = t_acc[:].astype(io_dtype)          # one cast, dot in bf16
        y = jax.lax.dot_general(
            t_b, dq,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        y_ref[:] = (y + bias_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tk", "tn", "group",
                                              "interpret"))
def _fused_2d_q4(x, a4, asc, azs, b4, bsc, bzs, bias, *, tk=512, tn=512,
                 group=128, interpret=False):
    """x [M,K]; a4 [N, Rp/2] uint8 packed (+ asc/azs [N, Rp/group]);
    b4 [Rp, K/2] packed (+ bsc/bzs [Rp, K/group]); bias [1,N].
    All pre-padded; tk/tn must be MULTIPLES of the pack col_tile (the
    kernel resolves the split-half nibble layout per 512-col pack tile)."""
    M, K = x.shape
    N = a4.shape[0]
    R = b4.shape[0]
    nk, nn = _cdiv(K, tk), _cdiv(N, tn)
    gk = tk // group            # scale cols per K tile
    gkp = _round_up(gk, 8)      # sublane-aligned group rows per tile

    # B scales -> per-K-tile 3D layout [nk, gkp, R]: a (1, gkp, R) block
    # satisfies Mosaic tiling ((R, gk) blocks do not: gk < 8 lanes), and
    # the kernel reads scale row k of its tile statically
    def _tile3(s):
        s3 = s.T.reshape(nk, gk, R)
        return jnp.pad(s3, ((0, 0), (0, gkp - gk), (0, 0)))

    bsc3, bzs3 = _tile3(bsc), _tile3(bzs)

    grid_spec = pl.GridSpec(
        grid=(nk + nn,),
        scratch_shapes=[pltpu.VMEM((M, R), jnp.float32)],
        in_specs=[
            pl.BlockSpec((M, tk), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tk // 2), lambda g: (0, jnp.minimum(g, nk - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gkp, R),
                         lambda g: (jnp.minimum(g, nk - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gkp, R),
                         lambda g: (jnp.minimum(g, nk - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, R // 2), lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, R // group),
                         lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, R // group),
                         lambda g: (jnp.maximum(g - nk, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda g: (0, jnp.maximum(g - nk, 0)),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_q4_kernel, nk=nk, nn=nn, group=group,
                          pack_tile=512),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * R * (K + N),
            bytes_accessed=a4.size + b4.size + x.size * x.dtype.itemsize
            + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, b4, bsc3, bzs3, a4, asc, azs, bias)


# Tile size was swept on chip (512/1024/2048, chained 7-matmul layer at
# 7B dims): q4 512 -> 1108 us, 1024 -> 1133, 2048 -> 1363; q8 flat at
# ~470 us across all three. Bigger tiles only grow the VMEM-resident
# dequant intermediates, so 512 stays the choice; the q4 kernel is bound
# by the per-group dequant VPU work itself (see DESIGN.md round 3).
_MAX_TILE = 512
# q8 re-swept in round 5 AFTER the prepad fix (per-step jnp.pad of the
# weight codes used to dominate and flatten the cap curve): chained
# prepadded 7-matmul layer at 7B dims, M=16 — cap512 877.8 us,
# cap1024 826.0, cap2048 787.2 (q8_sweep_r5.json). Bigger tiles cut the
# grid-iteration count (fewer scale/zero reload + accumulator spills);
# the dequant VPU cost that caps q4 at 512 is 4x smaller per byte here.
_MAX_TILE_Q8 = 2048


def q4_tiles(K: int, N: int, col_tile: int = 512):
    """K/N grid tiles (pack-col_tile multiples), capped at _MAX_TILE."""
    tk = min(_MAX_TILE, _round_up(K, col_tile))
    tn = min(_MAX_TILE, _round_up(N, col_tile))
    return tk, tn


def fused_lowrank_apply_q4(x, a4, asc, azs, b4, bsc, bzs, bias=None, *,
                           group=128, interpret=False):
    """4-bit-factor fused apply (deployment format of the reference's AWQ
    w4 GEMM path, ref quantization.py:269): y = (x @ dq(B4).T) @ dq(A4).T
    + bias. a4/b4 are pack_int4 layouts quantized by
    quant.quantize_to_int4_grouped at col_tile=512 (K and R already padded
    to 512 multiples at quantize time); K columns / N rows are padded here
    up to the (larger) kernel tile — padded groups carry zero scales, so
    they dequantize to exactly 0 and cannot perturb the dots."""
    from asvd4llm_tpu.ops.lowrank import lowrank_apply
    from asvd4llm_tpu.ops.quant import dequantize_int4_grouped

    N = asc.shape[0]
    Rp = b4.shape[0]
    Kp = b4.shape[1] * 2
    K = x.shape[-1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d

    on_tpu = jax.default_backend() == "tpu"
    if not (interpret or on_tpu) or M > _MAX_FUSED_TOKENS:
        a = dequantize_int4_grouped(a4, asc, azs, group=group,
                                    dtype=x.dtype)[:, :Rp]
        b = dequantize_int4_grouped(b4, bsc, bzs, group=group,
                                    dtype=x.dtype)[:, :Kp]
        y = lowrank_apply(
            jnp.pad(x.reshape(M, K), ((0, 0), (0, Kp - K))), a, b, bias)
        return y.reshape(*lead, N)

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Mp = _round_up(max(M, sub), sub)
    # row-padded A4 (prepad_quantized_leaves) dispatches with no runtime
    # pad of the code array — same serving-step traffic fix as q8
    NpA = max(N, a4.shape[0])
    tk, tn = q4_tiles(Kp, NpA)
    if NpA % tn:
        t2 = _pick_tile(NpA, _MAX_TILE)
        if t2 is not None and t2 % 512 == 0:
            tn = t2
    Kp2 = _round_up(Kp, tk)
    Np = _round_up(NpA, tn)
    x2 = _pad2(x.reshape(M, K), Mp, Kp2)
    a4p = _pad2(a4, Np, a4.shape[1])
    ascp = _pad2(asc.astype(jnp.float32), Np, asc.shape[1])
    azsp = _pad2(azs.astype(jnp.float32), Np, azs.shape[1])
    b4p = _pad2(b4, b4.shape[0], Kp2 // 2)
    bscp = _pad2(bsc.astype(jnp.float32), bsc.shape[0],
                 bsc.shape[1] + (Kp2 - Kp) // group)
    bzsp = _pad2(bzs.astype(jnp.float32), bzs.shape[0],
                 bzs.shape[1] + (Kp2 - Kp) // group)
    biasp = jnp.zeros((1, Np), x.dtype) if bias is None else \
        jnp.pad(bias.astype(x.dtype), (0, Np - N)).reshape(1, Np)
    y = _fused_2d_q4(x2, a4p, ascp, azsp, b4p, bscp, bzsp,
                     biasp, tk=tk, tn=tn, group=group, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)


def fused_lowrank_apply_q8(x, a8, a_qp, b8, b_qp, bias=None, *,
                           interpret=False, tile_cap=None):
    """Quantized-factor fused apply: y = (x @ dq(B8).T) @ dq(A8).T + bias.
    a_qp / b_qp are ops.quant.QuantParams (per-row scale & zero).

    True dims come from the SCALES (never padded); the code arrays may be
    PRE-PADDED to tile multiples (prepad_quantized_leaves — the serving
    engine does this once at init) so the decode step dispatches with no
    runtime jnp.pad of weight-sized arrays, and tiles are chosen to DIVIDE
    the padded dims (see _pick_tile)."""
    from asvd4llm_tpu.ops.lowrank import lowrank_apply
    from asvd4llm_tpu.ops.quant import dequantize

    K = x.shape[-1]
    N = a_qp.scale.shape[0]
    R = b_qp.scale.shape[0]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d

    on_tpu = jax.default_backend() == "tpu"
    if not (interpret or on_tpu) or M > _MAX_FUSED_TOKENS:
        # prefill / CPU: slice possibly pre-padded codes back to true dims
        a = dequantize(a8[:N, :R], a_qp, x.dtype)
        b = dequantize(b8[:R, :K], b_qp, x.dtype)
        return lowrank_apply(x, a, b, bias)

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Mp = _round_up(max(M, sub), sub)
    Rp = max(_round_up(R, 128), a8.shape[1], b8.shape[0])
    cap = tile_cap or _MAX_TILE_Q8
    Kp = max(_round_up(K, 128), b8.shape[1])
    Np = max(_round_up(N, 128), a8.shape[0])
    tk = _pick_tile(Kp, cap)
    tn = _pick_tile(Np, cap)
    if tk is None:  # no dividing tile: round up and pad (one-off shapes)
        tk = min(cap, _round_up(K, 128))
        Kp = _round_up(K, tk)
    if tn is None:
        tn = min(cap, _round_up(N, 128))
        Np = _round_up(N, tn)

    x2 = _pad2(x.reshape(M, K), Mp, Kp)
    a8p = _pad2(a8, Np, Rp)
    b8p = _pad2(b8, Rp, Kp)
    asc = _pad2(a_qp.scale.astype(jnp.float32).reshape(N, 1), Np, 1)
    azp = _pad2(a_qp.zero.astype(jnp.float32).reshape(N, 1), Np, 1)
    # padded rows must dequantize to zero: zero scale does it
    bsc = _pad2(b_qp.scale.astype(jnp.float32).reshape(R, 1), Rp, 1)
    bzp = _pad2(b_qp.zero.astype(jnp.float32).reshape(R, 1), Rp, 1)
    biasp = jnp.zeros((1, Np), x.dtype) if bias is None else \
        jnp.pad(bias.astype(x.dtype), (0, Np - N)).reshape(1, Np)

    y = _fused_2d_q8(x2, a8p, asc, azp, b8p, bsc, bzp, biasp, tk=tk, tn=tn,
                     interpret=interpret)
    return y[:M, :N].reshape(*lead, N)


# decode-regime cap: above this token count the op is compute-bound and the
# XLA dot-dot path pipelines just as well without holding x in VMEM
_MAX_FUSED_TOKENS = 1024


def prepad_quantized_leaves(params, spec):
    """Pad every q8/q4 leaf's CODE arrays to the fused kernels' tile grid,
    once. Scales/zeros/bias keep their true dims (they carry N/R for the
    apply and stay consistent for export consumers, which always use the
    original unpadded pytree — this returns an engine-private copy).

    Why: the serving engine passes params as jit ARGUMENTS, so any
    jnp.pad of a weight-sized array inside the decode step re-copies the
    whole factor every step — measured in round 4 as the bulk of q8
    serving's 29% roofline gap (q8 71.3% vs dense 98.0%,
    serving_bench_r4c.json). After this, `fused_lowrank_apply_q8/q4`'s
    `_pad2` calls are Python no-ops and `_pick_tile` finds dividing tiles."""
    from asvd4llm_tpu.models.registry import (
        is_q4_lowrank, is_q8_lowrank, iter_linears, set_linear,
    )

    out = params
    for name, leaf in iter_linears(params, spec, include_extras=True):
        if is_q8_lowrank(leaf):
            N, R = leaf["A8"].shape
            Rb, K = leaf["B8"].shape
            Np, Rp, Kp = (_round_up(N, 512), _round_up(max(R, Rb), 128),
                          _round_up(K, 512))
            if (N, R, Rb, K) == (Np, Rp, Rp, Kp):
                continue
            new = dict(leaf)
            new["A8"] = _pad2(jnp.asarray(leaf["A8"]), Np, Rp)
            new["B8"] = _pad2(jnp.asarray(leaf["B8"]), Rp, Kp)
            out = set_linear(out, spec, name, new)
        elif is_q4_lowrank(leaf):
            N = leaf["Asc"].shape[0]
            Np = _round_up(N, 512)
            if N == Np:
                continue
            new = dict(leaf)
            new["A4"] = _pad2(jnp.asarray(leaf["A4"]), Np,
                              leaf["A4"].shape[1])
            out = set_linear(out, spec, name, new)
    return out


def fused_lowrank_apply(x, a, b, bias=None, *, interpret=False,
                        max_tokens=_MAX_FUSED_TOKENS, tile_cap=None):
    """Public entry: x [..., K] -> [..., N]; dispatches to the fused
    kernel, falling back to XLA for prefill shapes or non-TPU backends.
    Tiles divide the dims when possible (no runtime pad of the factors —
    the same per-dispatch traffic fix as the q8 path; round 4's bf16
    kernel measurements paid a read+write copy of BOTH factors per call)."""
    from asvd4llm_tpu.ops.lowrank import lowrank_apply

    K = x.shape[-1]
    N, R = a.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d

    on_tpu = jax.default_backend() == "tpu"
    if not (interpret or on_tpu) or M > max_tokens:
        return lowrank_apply(x, a, b, bias, use_pallas=False)

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Mp = _round_up(max(M, sub), sub)
    Rp = _round_up(R, 128)
    cap = tile_cap or _MAX_TILE
    Kp = _round_up(K, 128)
    Np = _round_up(N, 128)
    tk = _pick_tile(Kp, cap)
    tn = _pick_tile(Np, cap)
    if tk is None:
        tk = min(cap, Kp)
        Kp = _round_up(K, tk)
    if tn is None:
        tn = min(cap, Np)
        Np = _round_up(N, tn)

    x2 = _pad2(x.reshape(M, K), Mp, Kp)
    ap = _pad2(a, Np, Rp)
    bp = _pad2(b, Rp, Kp)
    biasp = jnp.zeros((1, Np), x.dtype) if bias is None else \
        jnp.pad(bias.astype(x.dtype), (0, Np - N)).reshape(1, Np)

    y = _fused_2d(x2, ap, bp, biasp, tk=tk, tn=tn, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)
