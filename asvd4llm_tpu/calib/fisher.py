"""Fisher-information calibration.

Reference semantics (ref act_aware_utils.py:8-44): per calibration batch,
forward with labels = input_ids shifted by one, mean-CE loss, full
backward; accumulate ``weight.grad ** 2 . mean(axis=0)`` per linear
(a per-input-channel vector); finally ``sqrt(sum / n_batches)``.

Deviation (deliberate): the reference passes labels already shifted by one
to the HF model, which shifts them AGAIN internally (ref :25-27), so its
Fisher gradient is of a predict-2-ahead loss. We compute the standard
next-token loss (single shift); this is the intended Fisher information.

TPU-native shape: ``jax.grad`` of the jitted CE loss w.r.t. ONLY the
linear weight leaves (everything else is non-differentiated to save
memory), with the per-channel reduction fused into the same jit. For
large models this composes with remat and tensor-parallel sharding of the
grads (parallel/).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import apply_lm_head, forward_hidden
from asvd4llm_tpu.models.registry import is_lowrank, iter_linears, set_linear

log = logging.getLogger(__name__)


def _split_linear_weights(params, spec, include_extras=False):
    """Split params into (diff_weights {name: w}, closure rebuilding params)."""
    weights = {name: leaf["w"]
               for name, leaf in iter_linears(params, spec, include_extras)
               if not is_lowrank(leaf)}
    return weights


def _rebuild(params, spec, weights):
    out = params
    for name, w in weights.items():
        if name == "lm_head" and params.get("lm_head") is None:
            # tied head: the differentiated weight IS the embedding matrix,
            # so the gradient flows through BOTH uses — matching torch's
            # shared-Parameter .grad on a tied lm_head (the reference hooks
            # fisher onto every nn.Linear incl. the tied head)
            out = dict(out)
            out["embed_tokens"] = w
            continue
        from asvd4llm_tpu.models.registry import get_linear
        leaf = dict(get_linear(out, spec, name))
        leaf["w"] = w
        out = set_linear(out, spec, name, leaf)
    return out


@functools.partial(jax.jit, static_argnames=("spec", "double_shift"))
def _fisher_step(params, weights, ids, spec, double_shift=False):
    """One batch -> {name: grad(w)^2.mean(axis=0)} (per-input-channel).

    double_shift=True reproduces the reference's exact loss: it passes
    labels already shifted by one to the HF model, which shifts them AGAIN
    internally (ref act_aware_utils.py:25-27), so the gradient is of a
    predict-2-ahead CE. False (default) is the intended next-token Fisher."""
    if double_shift:
        inputs = ids[:, :-1]
        labels = ids[:, 2:]
    else:
        inputs = ids[:, :-1]
        labels = ids[:, 1:]

    def loss_fn(ws):
        p = _rebuild(params, spec, ws)
        # remat: recompute layer activations in the backward instead of
        # storing them — the full-model backward is the memory peak of the
        # whole pipeline (SURVEY §7.3 "Fisher memory")
        hidden, _ = forward_hidden(p, inputs, spec, remat=True)
        logits = apply_lm_head(p, spec, hidden)
        if double_shift:
            logits = logits[:, :-1]  # HF's internal shift (ref modeling)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return nll.mean()

    grads = jax.grad(loss_fn)(weights)
    return {name: (g.astype(jnp.float32) ** 2).mean(axis=0)
            for name, g in grads.items()}


def calib_fisher_info(params, spec, calib_loader, cache=None,
                      cache_key: str = "", include_extras: bool = True,
                      double_shift: bool = False) -> dict:
    """Returns {linear_name: fisher vector [in_features]}
    (= sqrt(mean over batches of grad² row-mean), ref act_aware_utils.py:31-36)."""
    if cache is not None:
        hit = cache.load_arrays("fisher", cache_key)
        if hit is not None:
            log.info("fisher cache hit (%s)", cache_key)
            return {k: jnp.asarray(v) for k, v in hit.items()}

    weights = _split_linear_weights(params, spec, include_extras)
    acc: dict = {}
    n = 0
    for batch in calib_loader:
        ids = jnp.asarray(np.asarray(batch["input_ids"]))
        step = _fisher_step(params, weights, ids, spec,
                            double_shift=double_shift)
        for k, v in step.items():
            acc[k] = v if k not in acc else acc[k] + v
        n += 1

    fisher = {k: jnp.sqrt(v / n) for k, v in acc.items()}
    if cache is not None:
        cache.save_arrays("fisher", cache_key,
                          {k: np.asarray(v) for k, v in fisher.items()})
    return fisher
