"""Activation-statistics calibration (abs_mean / abs_max).

Functional replacement for the reference's forward hooks
(ref act_aware_utils.py:47-95): one jitted stats-collecting forward per
calibration sample length; statistics are returned as an explicit pytree
and accumulated on device. Accumulation semantics match the hooks exactly:

- abs_mean: sum over calibration samples of the per-sample mean over the
  sequence axis of |input| (ref :65-67; NOT divided by n),
- abs_max: running elementwise max over samples and positions (ref :68-74).

With a data-parallel mesh the batches shard over the `dp` axis and the sum
/ max reductions ride a psum/pmax — see parallel/.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import forward_with_stats

log = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("spec", "method"))
def _stats_forward(params, ids, spec, method):
    _, stats = forward_with_stats(params, ids, spec, collect=method)
    return stats


@functools.partial(jax.jit, static_argnames=("spec", "method"))
def _stats_forward_scan(head_params, stacked, ids, spec, method):
    from asvd4llm_tpu.models.scan_forward import forward_stats_scan
    return forward_stats_scan(head_params, ids, spec, stacked=stacked,
                              collect=method)


def _stacked_batches(calib_loader, batch_size: int):
    """Group same-length samples into [B, L] device batches. Valid because
    both stats reductions are per-sample-then-combine (sum / max), so
    stacking preserves the reference's one-sample-at-a-time semantics."""
    by_len: dict = {}
    for b in calib_loader:
        ids = np.asarray(b["input_ids"]).reshape(-1)
        by_len.setdefault(len(ids), []).append(ids)
    for L, rows in by_len.items():
        for i in range(0, len(rows), batch_size):
            yield np.stack(rows[i:i + batch_size])


def calib_input_distribution(params, spec, calib_loader, method: str,
                             cache=None, cache_key: str = "",
                             batch_size: int = 8, stacked=None) -> dict:
    """Run calibration forwards and return {linear_name: [in_features]}.

    calib_loader: list of {"input_ids": [1, L]} dicts (reference loader
    contract). Same-length samples are STACKED into device batches (the
    reference runs one sample per forward, ref act_aware_utils.py:84-87) —
    with a dp mesh axis the stacked batch shards across chips and the
    sum/max combine rides a psum/pmax. `method` may be "abs_mean",
    "abs_max", or the reference's composite strings (substring match,
    ref act_aware_utils.py:65-69).
    """
    if "abs_mean" in method:
        mode = "abs_mean"
    elif "abs_max" in method:
        mode = "abs_max"
    else:
        raise ValueError(f"unknown scaling method {method!r}")

    if cache is not None:
        hit = cache.load_arrays(f"calib_{mode}", cache_key)
        if hit is not None:
            log.info("calibration stats cache hit (%s)", cache_key)
            return {k: jnp.asarray(v) for k, v in hit.items()}

    acc: dict = {}
    if stacked is not None:
        # host-master residency (models/hostmem.py): per-layer leaves live
        # on host; the scan-stats forward runs over the stacked arrays and
        # returns per-key [L, in] stats, split into names afterwards
        from asvd4llm_tpu.models.registry import linear_name
        hp = {k: v for k, v in params.items() if k != "layers"}
        for ids_np in _stacked_batches(calib_loader, batch_size):
            layer_st, extra_st = _stats_forward_scan(
                hp, stacked, jnp.asarray(ids_np), spec, mode)
            stats = dict(extra_st)
            L = next(iter(layer_st.values())).shape[0]
            for key, arr in layer_st.items():
                for li in range(L):
                    stats[linear_name(spec, li, key)] = arr[li]
            for k, v in stats.items():
                if k not in acc:
                    acc[k] = v
                elif mode == "abs_mean":
                    acc[k] = acc[k] + v
                else:
                    acc[k] = jnp.maximum(acc[k], v)
    else:
        for ids_np in _stacked_batches(calib_loader, batch_size):
            stats = _stats_forward(params, jnp.asarray(ids_np), spec, mode)
            for k, v in stats.items():
                if k not in acc:
                    acc[k] = v
                elif mode == "abs_mean":
                    acc[k] = acc[k] + v
                else:
                    acc[k] = jnp.maximum(acc[k], v)

    if cache is not None:
        cache.save_arrays(f"calib_{mode}", cache_key,
                          {k: np.asarray(v) for k, v in acc.items()})
    return acc
