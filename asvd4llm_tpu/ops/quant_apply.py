"""Model-level RTN quantization application.

Mirrors ``rtn_quant_sequential`` (ref quantization.py:156-175): fake-quant
EVERY linear inside every decoder layer — including both factors of
low-rank leaves (the reference's recursive find_layers reaches ALinear and
BLinear, ref :147-153). Embeddings / norms / lm_head untouched, matching
the reference's decoder-layers-only walk (ref :160-163).
"""

from __future__ import annotations

import logging

import jax

from asvd4llm_tpu.models.registry import is_lowrank, iter_linears, set_linear
from asvd4llm_tpu.ops.quant import rtn_quantize_weight

log = logging.getLogger(__name__)

_BITS = {"rtn_int8": 8, "rtn_int6": 6, "rtn_int4": 4}


def quantize_lowrank_factors_int8(params, spec):
    """Deployment conversion: every low-rank leaf's factors to REAL int8
    codes + per-row scales, dispatched at apply time to the fused q8
    Pallas kernel. (The rtn_*/awq_* modes above are fake-quant, matching
    the reference's evaluation methodology; this is the serve format.)"""
    from asvd4llm_tpu.models.registry import is_lowrank, q8_lowrank_leaf
    from asvd4llm_tpu.ops.quant import quantize_to_int

    out = params
    n = 0
    # include_extras: a compressed lm_head / OPT projection is a low-rank
    # leaf like any other and must serve quantized too
    for name, leaf in iter_linears(params, spec, include_extras=True):
        if not is_lowrank(leaf):
            continue
        a8, aq = quantize_to_int(leaf["A"], 8)
        b8, bq = quantize_to_int(leaf["B"], 8)
        out = set_linear(out, spec, name, q8_lowrank_leaf(
            a8, aq.scale, aq.zero, b8, bq.scale, bq.zero, leaf["b"]))
        n += 1
    log.info("converted %d low-rank leaves to int8 deployment format", n)
    return out


def quantize_lowrank_factors_int4(params, spec, *, group: int = 128,
                                  stats=None, awq_fold: bool = True):
    """Deployment conversion to REAL int4: every low-rank leaf's factors
    become packed 4-bit codes + per-(row, group) scales, dispatched at
    apply time to the fused q4 Pallas kernel (the reference deploys AWQ
    w4 GEMM, ref quantization.py:269).

    awq_fold: AWQ's scale trick applied EXACTLY on the rank dimension —
    the reference's scale-propagation pair (prev_op=BLinear,
    layers=[ALinear], ref quantization.py:190-204): pick a per-rank scale
    s from latent magnitudes, quantize A·diag(s), and fold diag(1/s) into
    B (lossless compensation, both factors stay real-quantizable). The B
    factor's own input channels have no foldable prev op in a functional
    pytree, so B is grouped RTN."""
    import jax.numpy as jnp

    from asvd4llm_tpu.models.registry import q4_lowrank_leaf
    from asvd4llm_tpu.ops.quant import quantize_to_int4_grouped

    stats = stats or {}
    out = params
    n = 0
    for name, leaf in iter_linears(params, spec, include_extras=True):
        if not is_lowrank(leaf):
            continue
        a, b = leaf["A"], leaf["B"]
        if awq_fold:
            from asvd4llm_tpu.ops.awq import _latent_abs_mean
            x_b = stats.get(name)
            if x_b is None:
                x_b = jnp.ones((b.shape[1],), jnp.float32)
            s = jnp.sqrt(jnp.maximum(_latent_abs_mean(leaf, x_b), 1e-8))
            s = s / jnp.exp(jnp.mean(jnp.log(s)))  # geo-mean 1 (AWQ norm)
            a = (a.astype(jnp.float32) * s[None, :]).astype(a.dtype)
            b = (b.astype(jnp.float32) / s[:, None]).astype(b.dtype)
        # both factors quantize along their INPUT dim per AWQ convention:
        # A groups along the rank, B groups along the model channels
        a4, asc, azs = quantize_to_int4_grouped(a, group=group)
        b4, bsc, bzs = quantize_to_int4_grouped(b, group=group)
        # pad the rank to the pack col_tile so A's packed cols and B's rows
        # agree (the kernel's t_acc spans Rp)
        Rp = a4.shape[1] * 2
        if b4.shape[0] != Rp:
            b4 = jnp.pad(b4, ((0, Rp - b4.shape[0]), (0, 0)))
            bsc = jnp.pad(bsc, ((0, Rp - bsc.shape[0]), (0, 0)))
            bzs = jnp.pad(bzs, ((0, Rp - bzs.shape[0]), (0, 0)))
        out = set_linear(out, spec, name, q4_lowrank_leaf(
            a4, asc, azs, b4, bsc, bzs, leaf["b"]))
        n += 1
    log.info("converted %d low-rank leaves to int4 deployment format "
             "(group=%d, awq_fold=%s)", n, group, awq_fold)
    return out


def quantize_model_weights(params, spec, weight_quant: str, *, stats=None):
    if weight_quant.startswith("awq"):
        from asvd4llm_tpu.ops.awq import awq_quantize_model
        bits = 8 if weight_quant == "awq_int8" else 4
        return awq_quantize_model(params, spec, bits, stats=stats)
    bits = _BITS[weight_quant]
    quant = jax.jit(lambda w: rtn_quantize_weight(w, bits))
    out = params
    for name, leaf in iter_linears(params, spec):
        if is_lowrank(leaf):
            new = dict(leaf)
            new["A"] = quant(leaf["A"])
            new["B"] = quant(leaf["B"])
        else:
            new = dict(leaf)
            new["w"] = quant(leaf["w"])
        out = set_linear(out, spec, name, new)
    log.info("rtn int%d quantized all decoder linears", bits)
    return out
