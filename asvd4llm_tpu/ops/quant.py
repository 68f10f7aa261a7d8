"""Round-to-nearest weight quantization of dense weights and SVD factors.

Math parity with the reference's GPTQ-derived Quantizer
(ref quantization.py:17-144): per-output-channel asymmetric min/max
including zero, ``scale = (max-min)/maxq``, ``zero = round(-min/scale)``,
fake-quant ``scale * (clamp(round(x/scale) + zero, 0, maxq) - zero)``,
optional per-channel MSE grid search over shrunken ranges
(ref :94-111). Applied to every linear inside every decoder layer —
including both low-rank factors — exactly like ``rtn_quant_sequential``
(ref :156-175).

Everything here is jittable jnp; per-layer application is vmapped where
shapes bucket.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantParams(NamedTuple):
    scale: jax.Array  # [rows, 1]
    zero: jax.Array   # [rows, 1]
    maxq: int


def find_quant_params(w: jax.Array, bits: int, *, sym: bool = False,
                      mse: bool = False, norm: float = 2.4, grid: int = 100,
                      maxshrink: float = 0.8) -> QuantParams:
    """Per-row (output-channel) quantization ranges (ref quantization.py:52-133,
    the weight=True / perchannel=True path used by rtn_quant_sequential)."""
    maxq = 2 ** bits - 1
    x = w.astype(jnp.float32)
    rows = x.shape[0]
    flat = x.reshape(rows, -1)

    zeros = jnp.zeros((rows,), jnp.float32)
    xmin = jnp.minimum(flat.min(axis=1), zeros)
    xmax = jnp.maximum(flat.max(axis=1), zeros)

    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if mse:
        # grid search shrink factor p per channel (ref quantization.py:94-111)
        best = jnp.full((rows,), jnp.inf, jnp.float32)
        for i in range(int(maxshrink * grid)):
            p = 1 - i / grid
            xmin1, xmax1 = p * xmin, p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero if sym else jnp.round(-xmin1 / scale1)
            q = _fake_quant(flat, scale1[:, None], zero1[:, None], maxq)
            err = jnp.sum(jnp.abs(q - flat) ** norm, axis=1)
            better = err < best
            best = jnp.where(better, err, best)
            scale = jnp.where(better, scale1, scale)
            zero = jnp.where(better, zero1, zero)

    return QuantParams(scale=scale[:, None], zero=zero[:, None], maxq=maxq)


def _fake_quant(x, scale, zero, maxq):
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def rtn_quantize_weight(w: jax.Array, bits: int, *, sym: bool = False,
                        mse: bool = False) -> jax.Array:
    """Fake-quantize a weight matrix in place-of (ref quantization.py:166-172:
    find_params → quantize → cast back to original dtype)."""
    qp = find_quant_params(w, bits, sym=sym, mse=mse)
    wq = _fake_quant(w.astype(jnp.float32), qp.scale, qp.zero, qp.maxq)
    return wq.astype(w.dtype)


def quantize_to_int(w: jax.Array, bits: int) -> tuple[jax.Array, QuantParams]:
    """Real quantization: returns integer codes + params for a Pallas int8
    matmul path. Unsigned codes 0..maxq are shifted by 2**(bits-1) into
    int8 range; the shift is folded into the returned zero point so
    ``dequantize`` stays ``scale * (q - zero)``."""
    assert bits <= 8
    qp = find_quant_params(w, bits)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / qp.scale) + qp.zero,
                 0, qp.maxq)
    shift = 2 ** (bits - 1)
    q_signed = (q - shift).astype(jnp.int8)
    qp_shifted = QuantParams(scale=qp.scale, zero=qp.zero - shift, maxq=qp.maxq)
    return q_signed, qp_shifted


def dequantize(q: jax.Array, qp: QuantParams, dtype=jnp.float32) -> jax.Array:
    return (qp.scale * (q.astype(jnp.float32) - qp.zero)).astype(dtype)


# --------------------------------------------------------------- int4 ----
#
# Real 4-bit deployment format for low-rank factors (the reference deploys
# AWQ w4 GEMM, ref quantization.py:269 / experiments/quantize.sh). Codes are
# 0..15, asymmetric per (row, col-group); two codes pack into one uint8.
#
# Packing layout (chosen for the TPU kernel, ops/pallas_lowrank.py):
# columns are processed in COL_TILE-wide tiles; within each tile the LOW
# nibble of packed column c holds original column c of the tile's first
# half and the HIGH nibble holds the tile's second half. Unpacking a tile
# therefore yields two CONTIGUOUS half-tiles — no lane interleave (a
# relayout Mosaic punishes) is ever needed.

INT4_COL_TILE = 512


def quantize_to_int4_grouped(w: jax.Array, group: int = 128,
                             col_tile: int = INT4_COL_TILE):
    """w [rows, cols] -> (packed uint8 [rows, colsP/2],
                          scale f32 [rows, colsP/group],
                          zero_scale f32 [rows, colsP/group])
    with colsP = cols padded to a col_tile multiple (padded groups have
    scale 0 so they dequantize to exactly 0). `group` must divide
    col_tile/2 so no group straddles a nibble-half boundary.

    Dequant of code q in (row r, group g): scale[r,g]*q - zero_scale[r,g]
    (zero folded into zero_scale = scale*zero so the matmul kernel's
    correction term is a single outer product per group)."""
    assert (col_tile // 2) % group == 0, (group, col_tile)
    rows, cols = w.shape
    colsP = _ceil_to(cols, col_tile)
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, colsP - cols)))
    ng = colsP // group
    wg = wp.reshape(rows, ng, group)
    xmin = jnp.minimum(wg.min(axis=-1), 0.0)
    xmax = jnp.maximum(wg.max(axis=-1), 0.0)
    degenerate = (xmax - xmin) == 0
    scale = jnp.where(degenerate, 0.0, (xmax - xmin) / 15.0)
    inv = jnp.where(scale == 0, 0.0, 1.0 / jnp.where(scale == 0, 1.0, scale))
    zero = jnp.round(-xmin * inv)
    q = jnp.clip(jnp.round(wg * inv[..., None]) + zero[..., None], 0, 15)
    q = q.reshape(rows, colsP).astype(jnp.uint8)
    packed = pack_int4(q, col_tile)
    return packed, scale, scale * zero


def _ceil_to(x, m):
    return -(-x // m) * m


def pack_int4(q: jax.Array, col_tile: int = INT4_COL_TILE) -> jax.Array:
    """q uint8 [rows, cols] (values 0..15, cols a col_tile multiple) ->
    packed uint8 [rows, cols/2] with the tile-aware split-half layout."""
    rows, cols = q.shape
    assert cols % col_tile == 0
    half = col_tile // 2
    qt = q.reshape(rows, cols // col_tile, 2, half)
    lo = qt[:, :, 0, :]
    hi = qt[:, :, 1, :]
    return (lo | (hi << 4)).reshape(rows, cols // 2)


def unpack_int4(packed: jax.Array, col_tile: int = INT4_COL_TILE) -> jax.Array:
    """Inverse of pack_int4 -> uint8 codes [rows, cols]."""
    rows, colsH = packed.shape
    half = col_tile // 2
    pt = packed.reshape(rows, colsH // half, half)
    lo = pt & 15
    hi = (pt >> 4) & 15
    return jnp.stack([lo, hi], axis=2).reshape(rows, colsH * 2)


def dequantize_int4_grouped(packed: jax.Array, scale: jax.Array,
                            zero_scale: jax.Array, group: int = 128,
                            col_tile: int = INT4_COL_TILE,
                            dtype=jnp.float32) -> jax.Array:
    """packed [rows, colsP/2] (+ per-group scale/zero_scale) -> [rows,
    colsP] floats (the XLA fallback / test oracle for the fused q4 kernel)."""
    q = unpack_int4(packed, col_tile).astype(jnp.float32)
    rows, colsP = q.shape
    qg = q.reshape(rows, colsP // group, group)
    w = qg * scale[..., None] - zero_scale[..., None]
    return w.reshape(rows, colsP).astype(dtype)
