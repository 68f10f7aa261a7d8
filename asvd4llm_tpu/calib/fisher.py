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

from asvd4llm_tpu.models.decoder import (
    _decoder_layer, _softcap, apply_lm_head, apply_linear, apply_norm,
    forward_hidden, rope_cos_sin,
)
from asvd4llm_tpu.models.registry import (
    is_lowrank, iter_linears, layer_linear_keys, linear_name, set_linear,
)

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


# -------------------------------------------------- streamed backward ----
#
# Host-master residency (models/hostmem.py) keeps per-layer weight masters
# in host RAM; `_fisher_step`'s whole-model `jax.grad` would re-upload ALL
# layers into one program — 13 GB of weights plus the backward's workspace,
# exactly what host-master exists to avoid (VERDICT r4 weak #7). The
# streamed path below is a manual layer-by-layer backward with O(1)-in-depth
# compiled programs:
#
#   forward   embed -> per-layer step (upload one layer, checkpoint its
#             input hidden) -> head loss; grads wrt (last hidden, head w)
#   backward  for i = L-1..0: re-upload layer i + its checkpoint, one
#             jax.vjp through the layer -> (per-channel grad^2, d hidden)
#
# Device residency: non-layer leaves + ONE layer + two hiddens + the head
# grad. Checkpoints stay on device while L*B*S*H fits the membudget slack,
# else they spill to host (the backward re-uploads one at a time).
# Numerics match `_fisher_step` exactly: same ops, same dtypes, same
# reduction (tested against it in tests/test_calib.py).


def _stream_mask(spec, S, uses_sliding):
    """Additive causal mask [1, 1, S, S] (no padding in calib batches);
    `uses_sliding` is static so gemma2's alternating layers cost at most
    two compiled programs, not one per layer."""
    pos = jnp.arange(S, dtype=jnp.int32)
    allow = pos[None, :] <= pos[:, None]
    if uses_sliding:
        allow &= pos[None, :] > (pos[:, None] - spec.sliding_window)
    return jnp.where(allow, 0.0, jnp.float32(-1e30))[None, None]


def _rope(spec, S):
    if spec.pos_emb != "rope":
        return None, None
    return rope_cos_sin(jnp.arange(S, dtype=jnp.int32), spec.head_dim,
                        spec.rope_theta)


@functools.partial(jax.jit, static_argnames=("spec",))
def _embed_step(nonlayer, inputs, spec):
    x = nonlayer["embed_tokens"][inputs]
    if spec.embed_scale != 1.0:
        x = x * jnp.asarray(spec.embed_scale, dtype=x.dtype)
    if spec.pos_emb == "learned":
        pos = jnp.arange(inputs.shape[1], dtype=jnp.int32)
        x = x + nonlayer["embed_positions"][pos + spec.pos_offset]
    return x


def _layer_diff_weights(layer, spec):
    return {k: layer[k]["w"] for k in layer_linear_keys(spec)
            if isinstance(layer.get(k), dict) and not is_lowrank(layer[k])}


def _layer_apply(spec, layer, ws, x, cos, sin, mask):
    lay = dict(layer)
    for k, w in ws.items():
        lay[k] = dict(lay[k])
        lay[k]["w"] = w
    out, _ = _decoder_layer(spec, lay, x, 0, cos, sin, mask,
                            la=lambda leaf, h: apply_linear(leaf, h))
    return out


@functools.partial(jax.jit, static_argnames=("spec", "uses_sliding"))
def _layer_fwd_step(layer, x, spec, uses_sliding):
    cos, sin = _rope(spec, x.shape[1])
    mask = _stream_mask(spec, x.shape[1], uses_sliding)
    return _layer_apply(spec, layer, {}, x, cos, sin, mask)


@functools.partial(jax.jit, static_argnames=("spec", "uses_sliding"))
def _layer_vjp_step(layer, x, g_out, spec, uses_sliding):
    """One layer's backward: (per-input-channel grad^2 per linear key,
    gradient wrt the layer's input hidden)."""
    cos, sin = _rope(spec, x.shape[1])
    mask = _stream_mask(spec, x.shape[1], uses_sliding)
    ws = _layer_diff_weights(layer, spec)

    def f(ws, x):
        return _layer_apply(spec, layer, ws, x, cos, sin, mask)

    _, vjp = jax.vjp(f, ws, x)
    gw, gx = vjp(g_out)
    return ({k: (g.astype(jnp.float32) ** 2).mean(axis=0)
             for k, g in gw.items()}, gx)


@functools.partial(jax.jit,
                   static_argnames=("spec", "double_shift", "diff_head"))
def _head_step(nonlayer, xL, labels, spec, double_shift, diff_head):
    """Final norm + lm-head CE; returns (grad wrt xL, grad wrt head weight
    or None). The head gradient stays UNREDUCED: a tied head also receives
    the embedding-lookup gradient (`_rebuild` ties them in the whole-model
    path) and grad^2 only distributes over the SUM of both uses."""
    head_w = (nonlayer["lm_head"]["w"] if nonlayer.get("lm_head") is not None
              else nonlayer["embed_tokens"])
    head_b = (nonlayer["lm_head"].get("b")
              if nonlayer.get("lm_head") is not None else None)

    def loss_fn(xL, head_w):
        h = xL
        if spec.final_norm and nonlayer.get("final_norm") is not None:
            h = apply_norm(spec, nonlayer["final_norm"], h)
        logits = jax.lax.dot_general(
            h, head_w, (((h.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.float32)
        if head_b is not None:
            logits = logits + head_b.astype(jnp.float32)
        if spec.final_logit_softcap > 0:
            logits = _softcap(logits, spec.final_logit_softcap)
        if double_shift:
            logits = logits[:, :-1]  # HF's internal shift (ref modeling)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return nll.mean()

    if diff_head:
        g_xL, g_head = jax.grad(loss_fn, argnums=(0, 1))(xL, head_w)
        return g_xL, g_head
    return jax.grad(loss_fn)(xL), None


@jax.jit
def _tied_head_fisher_sq(g_head_use, g_x0, inputs, embed_scale):
    """grad^2 row-mean of a TIED head weight: head use + embedding lookup
    (scatter-add of the first hidden's gradient) summed BEFORE squaring."""
    V, H = g_head_use.shape
    flat_g = g_x0.reshape(-1, H).astype(jnp.float32) * embed_scale
    g_emb = jnp.zeros((V, H), jnp.float32).at[inputs.reshape(-1)].add(flat_g)
    total = g_emb + g_head_use.astype(jnp.float32)
    return (total ** 2).mean(axis=0)


def _fisher_streamed_batch(params, spec, ids, *, include_extras,
                           double_shift, checkpoint_budget_fn):
    """One calibration batch's {name: grad^2 row-mean} with layer-streamed
    residency. `params` holds host (numpy) layer masters."""
    if params.get("project_in") is not None:  # OPT-350m only: tiny, never
        raise NotImplementedError(          # offloaded to host-master
            "streamed fisher does not support project_in/out models")
    nonlayer = {k: v for k, v in params.items() if k != "layers"}
    layers = params["layers"]
    inputs = ids[:, :-1]
    labels = ids[:, 2:] if double_shift else ids[:, 1:]

    tied = params.get("lm_head") is None
    diff_head = bool(include_extras)

    x = _embed_step(nonlayer, inputs, spec)
    x0 = x
    B, S, H = x.shape
    ckpt_on_device = checkpoint_budget_fn(len(layers) * x.nbytes)

    ckpts = []
    for i, layer in enumerate(layers):
        ckpts.append(x if ckpt_on_device else np.asarray(jax.device_get(x)))
        x = _layer_fwd_step(layer, x, spec, spec.layer_uses_sliding(i))

    g, g_head = _head_step(nonlayer, x, labels, spec, double_shift, diff_head)

    out = {}
    for i in range(len(layers) - 1, -1, -1):
        x_in = ckpts[i] if ckpt_on_device else jnp.asarray(ckpts[i])
        red, g = _layer_vjp_step(layers[i], x_in, g, spec,
                                 spec.layer_uses_sliding(i))
        for k, v in red.items():
            out[linear_name(spec, i, k)] = v
        ckpts[i] = None  # free as we go

    if diff_head:
        if tied:
            out["lm_head"] = _tied_head_fisher_sq(
                g_head, g, inputs, jnp.float32(spec.embed_scale))
        else:
            out["lm_head"] = (g_head.astype(jnp.float32) ** 2).mean(axis=0)
    return out


def _default_checkpoint_budget(total_ckpt_bytes: int) -> bool:
    """Keep forward checkpoints on device when they fit next to the live
    set with slack for one layer's backward workspace; else spill to host."""
    from asvd4llm_tpu.utils import membudget
    return membudget.fits(int(total_ckpt_bytes * 1.5))


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

    from asvd4llm_tpu.models import hostmem
    streamed = hostmem.is_host_layers(params)
    if streamed:
        log.info("fisher: host-master layers detected — layer-streamed "
                 "backward (one layer + two hiddens resident)")
    else:
        weights = _split_linear_weights(params, spec, include_extras)
    acc: dict = {}
    n = 0
    for batch in calib_loader:
        ids = jnp.asarray(np.asarray(batch["input_ids"]))
        if streamed:
            step = _fisher_streamed_batch(
                params, spec, ids, include_extras=include_extras,
                double_shift=double_shift,
                checkpoint_budget_fn=_default_checkpoint_budget)
        else:
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
