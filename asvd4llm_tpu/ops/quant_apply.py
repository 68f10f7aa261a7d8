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
    for name, leaf in iter_linears(params, spec):
        if not is_lowrank(leaf):
            continue
        a8, aq = quantize_to_int(leaf["A"], 8)
        b8, bq = quantize_to_int(leaf["B"], 8)
        out = set_linear(out, spec, name, q8_lowrank_leaf(
            a8, aq.scale, aq.zero, b8, bq.scale, bq.zero, leaf["b"]))
        n += 1
    log.info("converted %d low-rank leaves to int8 deployment format", n)
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
