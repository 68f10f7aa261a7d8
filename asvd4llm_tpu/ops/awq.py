"""AWQ-style activation-aware weight quantization, TPU-native.

Capability parity with the reference's AWQ bridge
(ref quantization.py:178-283), re-designed rather than wrapped:

- the reference subclasses llm-awq's Llama quantizer and rewires its
  scale-propagation graph so an SVDLinear contributes the pair
  (prev_op=BLinear, layers=[ALinear]) (ref :190-204). The essential
  mechanism is: choose a per-input-channel scale s from activation
  magnitudes, quantize W·diag(s) group-wise, and compensate s elsewhere;
- here the scale search runs per weight with the compensation folded back
  analytically (Q(W·s)/s), which is numerically identical for fake-quant
  evaluation and keeps the whole pass jittable — no module-graph surgery.
  Low-rank layers quantize BOTH factors, with the A factor's scale search
  driven by the RANK-dim latent statistics (the exact analogue of the
  reference's BLinear→ALinear scale pair);
- per-group asymmetric quantization with the reference's deployment
  config: group_size=128, zero_point=True, 4/8 bit (ref :269);
- the scale grid search minimizes the activation-weighted weight error
  sum_j E[x_j]^2 * (W_hat - W)_{:,j}^2 over alpha in [0, 1) — AWQ's
  salient-channel objective.

Used with --rank_align 128 like the reference's quantize.sh sweeps.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.registry import is_lowrank, iter_linears, set_linear

log = logging.getLogger(__name__)

N_GRID = 20


def groupwise_fake_quant(w: jax.Array, bits: int, group_size: int = 128
                         ) -> jax.Array:
    """Asymmetric min-max fake-quant in groups of `group_size` along the
    input dim (AWQ GEMM config, ref quantization.py:269)."""
    out_f, in_f = w.shape
    g = min(group_size, in_f)
    pad = (-in_f) % g
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, pad)))
    wg = wp.reshape(out_f, -1, g)
    maxq = 2 ** bits - 1
    xmin = jnp.minimum(wg.min(axis=-1, keepdims=True), 0)
    xmax = jnp.maximum(wg.max(axis=-1, keepdims=True), 0)
    degenerate = (xmax - xmin) == 0
    scale = jnp.where(degenerate, 1.0, (xmax - xmin) / maxq)
    zero = jnp.round(-xmin / scale)
    q = jnp.clip(jnp.round(wg / scale) + zero, 0, maxq)
    wq = (scale * (q - zero)).reshape(out_f, -1)[:, :in_f]
    return wq.astype(w.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "group_size"))
def awq_search_and_quant(w: jax.Array, act_mean: jax.Array, *, bits: int,
                         group_size: int = 128) -> jax.Array:
    """Grid-search the AWQ scale exponent and return the fake-quantized
    weight Q(W·s)/s at the best alpha (including alpha=0 == plain RTN)."""
    w32 = w.astype(jnp.float32)
    x = jnp.maximum(act_mean.astype(jnp.float32), 1e-8)
    weight_importance = x ** 2  # E[x_j]^2 proxy for output error weighting

    def err_at(wq):
        return jnp.sum((wq.astype(jnp.float32) - w32) ** 2
                       * weight_importance[None, :])

    best_w = groupwise_fake_quant(w32, bits, group_size)
    best_err = err_at(best_w)
    for i in range(1, N_GRID):
        alpha = i / N_GRID
        s = x ** alpha
        s = s / jnp.exp(jnp.mean(jnp.log(s)))  # normalize geo-mean to 1
        wq = groupwise_fake_quant(w32 * s[None, :], bits, group_size) / s[None, :]
        e = err_at(wq)
        better = e < best_err
        best_w = jnp.where(better, wq, best_w)
        best_err = jnp.minimum(e, best_err)
    return best_w.astype(w.dtype)


def _latent_abs_mean(leaf, act_mean):
    """Approximate E|t| of the rank-dim latent t = x @ B.T from the input
    statistics: E|t_r| ≈ sum_j |B_rj| E|x_j| (triangle-inequality proxy;
    exact stats would need a calibration pass over the compressed model —
    supported via stats collected with name '<layer>.ALinear')."""
    return jnp.abs(leaf["B"].astype(jnp.float32)) @ act_mean.astype(jnp.float32)


def awq_quantize_model(params, spec, bits: int, *, stats=None,
                       group_size: int = 128):
    """Quantize every decoder linear (dense weights and BOTH low-rank
    factors) with AWQ scale search. `stats`: {name: abs_mean} from
    calibration; entries named '<layer>.ALinear' (latent stats) are used
    for A factors when present, else approximated from B."""
    stats = stats or {}
    out = params
    n = 0
    for name, leaf in iter_linears(params, spec):
        new = dict(leaf)
        if is_lowrank(leaf):
            x_b = stats.get(name)
            if x_b is None:
                x_b = jnp.ones((leaf["B"].shape[1],), jnp.float32)
            x_a = stats.get(name + ".ALinear")
            if x_a is None:
                x_a = _latent_abs_mean(leaf, x_b)
            new["B"] = awq_search_and_quant(leaf["B"], x_b, bits=bits,
                                            group_size=group_size)
            new["A"] = awq_search_and_quant(leaf["A"], x_a, bits=bits,
                                            group_size=group_size)
        else:
            x = stats.get(name)
            if x is None:
                x = jnp.ones((leaf["w"].shape[1],), jnp.float32)
            new["w"] = awq_search_and_quant(leaf["w"], x, bits=bits,
                                            group_size=group_size)
        out = set_linear(out, spec, name, new)
        n += 1
    log.info("awq int%d quantized %d linears (group_size=%d)", bits, n,
             group_size)
    return out
