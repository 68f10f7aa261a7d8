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
               bias_ref, y_ref, t_acc, *, nk, nn):
    """Int8-factor variant: A/B stored as int8 codes + per-row (scale, zero)
    — HBM traffic is HALVED again vs bf16 factors; tiles are dequantized in
    VMEM (VPU) right before the MXU dot."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)

    @pl.when(g < nk)
    def _():
        b_f = (b_ref[:].astype(jnp.float32) - bzp_ref[:]) * bsc_ref[:]
        t_acc[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), b_f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(g >= nk)
    def _():
        a_f = (a_ref[:].astype(jnp.float32) - azp_ref[:]) * asc_ref[:]
        y = jax.lax.dot_general(
            t_acc[:], a_f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
        scratch_shapes=[pltpu.VMEM((M, R), jnp.float32)],
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


def fused_lowrank_apply_q8(x, a8, a_qp, b8, b_qp, bias=None, *,
                           interpret=False):
    """Quantized-factor fused apply: y = (x @ dq(B8).T) @ dq(A8).T + bias.
    a_qp / b_qp are ops.quant.QuantParams (per-row scale & zero)."""
    from asvd4llm_tpu.ops.lowrank import lowrank_apply
    from asvd4llm_tpu.ops.quant import dequantize

    K = x.shape[-1]
    N, R = a8.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d

    on_tpu = jax.default_backend() == "tpu"
    if not (interpret or on_tpu) or M > _MAX_FUSED_TOKENS:
        a = dequantize(a8, a_qp, x.dtype)
        b = dequantize(b8, b_qp, x.dtype)
        return lowrank_apply(x, a, b, bias)

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Mp = _round_up(max(M, sub), sub)
    Rp = _round_up(R, 128)
    tk = min(512, _round_up(K, 128))
    tn = min(512, _round_up(N, 128))
    Kp = _round_up(K, tk)
    Np = _round_up(N, tn)

    x2 = jnp.pad(x.reshape(M, K), ((0, Mp - M), (0, Kp - K)))
    a8p = jnp.pad(a8, ((0, Np - N), (0, Rp - R)))
    b8p = jnp.pad(b8, ((0, Rp - R), (0, Kp - K)))
    asc = jnp.pad(a_qp.scale.astype(jnp.float32), ((0, Np - N), (0, 0)))
    azp = jnp.pad(a_qp.zero.astype(jnp.float32), ((0, Np - N), (0, 0)))
    # padded rows must dequantize to zero: zero scale does it
    bsc = jnp.pad(b_qp.scale.astype(jnp.float32), ((0, Rp - R), (0, 0)))
    bzp = jnp.pad(b_qp.zero.astype(jnp.float32), ((0, Rp - R), (0, 0)))
    biasp = jnp.zeros((1, Np), x.dtype) if bias is None else \
        jnp.pad(bias.astype(x.dtype), (0, Np - N)).reshape(1, Np)

    y = _fused_2d_q8(x2, a8p, asc, azp, b8p, bsc, bzp, biasp, tk=tk, tn=tn,
                     interpret=interpret)
    return y[:M, :N].reshape(*lead, N)


# decode-regime cap: above this token count the op is compute-bound and the
# XLA dot-dot path pipelines just as well without holding x in VMEM
_MAX_FUSED_TOKENS = 1024


def fused_lowrank_apply(x, a, b, bias=None, *, interpret=False,
                        max_tokens=_MAX_FUSED_TOKENS):
    """Public entry: x [..., K] -> [..., N]; pads to hardware tiles and
    dispatches to the fused kernel, falling back to XLA for prefill shapes
    or non-TPU backends."""
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
    tk = min(512, _round_up(K, 128))
    tn = min(512, _round_up(N, 128))
    Kp = _round_up(K, tk)
    Np = _round_up(N, tn)

    x2 = x.reshape(M, K)
    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    ap = jnp.pad(a, ((0, Np - N), (0, Rp - R)))
    bp = jnp.pad(b, ((0, Rp - R), (0, Kp - K)))
    biasp = jnp.zeros((1, Np), x.dtype) if bias is None else \
        jnp.pad(bias.astype(x.dtype), (0, Np - N)).reshape(1, Np)

    y = _fused_2d(x2, ap, bp, biasp, tk=tk, tn=tn, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)
