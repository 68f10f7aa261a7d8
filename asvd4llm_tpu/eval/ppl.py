"""Perplexity evaluators with exact reference loss semantics.

Two evaluators, matching the two in the reference:

1. ``evaluate_perplexity`` (ref evaluate_utils.py:90-115) — used for the
   calibration-set PPL inside the sensitivity scan and ppl-target search:
   rows of a [n, seqlen] id matrix; per row, input = row[:-1],
   labels = row[1:], nll = mean-CE * seqlen (NOTE: *seqlen*, the
   reference's own off-by-one, kept for parity); ppl = exp(sum nll /
   (n * seqlen)).

2. ``evaluate_ppl_windowed`` (ref evaluate_utils.py:140-191) — the final
   wikitext2/ptb/c4 metric: non-overlapping seqlen windows over one long
   token stream, body/head split, shift-by-one CE over seqlen-1 positions,
   nll = mean-CE * seqlen; optional BOS mode shrinks the window to
   seqlen-1 and prepends BOS (ref :151,160-166).

Both are jitted once and scanned on device; the host only sees the final
scalar. The model forward is compiled once per pytree structure, so the
sensitivity scan's leaf swaps (same-shaped dense leaves) reuse the cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import apply_lm_head, forward_hidden


def _row_nll(params, spec, row):
    """Mean cross-entropy of next-token prediction for one [L] row,
    computed over row[:-1] -> row[1:]."""
    input_ids = row[None, :-1]
    labels = row[1:]
    hidden, _ = forward_hidden(params, input_ids, spec)
    logits = apply_lm_head(params, spec, hidden)[0]          # [L-1, V]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    return nll


def _rows_nll(params, spec, rows):
    """Mean next-token CE of each row in a batch [B, L] -> [B]."""
    inputs = rows[:, :-1]
    labels = rows[:, 1:]
    hidden, _ = forward_hidden(params, inputs, spec)
    logits = apply_lm_head(params, spec, hidden)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None],
                                axis=-1)[..., 0].mean(axis=-1)


@functools.partial(jax.jit, static_argnames=("spec", "row_batch"))
def _ppl_rows_jit(params, spec, ids, row_batch=4):
    """[n, L] -> reference ppl: exp(mean over rows of mean-CE).

    Rows are processed `row_batch` at a time (the reference forwards one
    row per step, ref evaluate_utils.py:99-104 — batching the rows is
    numerically identical since the statistic is a per-row mean, and fills
    the MXU far better for small models)."""
    n, L = ids.shape
    rb = min(row_batch, n)
    n_full = (n // rb) * rb
    chunks = ids[:n_full].reshape(n // rb, rb, L)

    def body(carry, chunk):
        return carry + _rows_nll(params, spec, chunk).sum(), None
    total, _ = jax.lax.scan(body, jnp.float32(0.0), chunks)
    if n_full < n:  # remainder rows
        total = total + _rows_nll(params, spec, ids[n_full:]).sum()
    return jnp.exp(total / n)


def evaluate_perplexity(params, spec, dataset, limit: int = -1,
                        row_batch: int = 4) -> float:
    """dataset: [n, seqlen] int ids (rows may come from concatenated calib
    samples, ref sensitivity.py:40). limit: evaluate first `limit` rows
    (ref evaluate_utils.py:100-101)."""
    ids = jnp.asarray(np.asarray(dataset))
    if limit is not None and 0 < limit < ids.shape[0]:
        ids = ids[:limit]
    # long rows shrink the batch so the unblocked attention-score
    # transient (rb * H * S^2 f32) stays bounded at canonical seqlen 2048
    rb = min(row_batch, max(1, 4096 // ids.shape[1]), ids.shape[0])
    return float(_ppl_rows_jit(params, spec, ids, rb))


@functools.partial(jax.jit, static_argnames=("spec", "use_bos",
                                              "bos_token_id", "scan_layers"))
def _window_nll_jit(params, spec, window, use_bos=False, bos_token_id=0,
                    scan_layers=False):
    """One [1, seqlen] window -> mean-CE over the seqlen-1 shifted positions
    (ref evaluate_utils.py:158-176)."""
    batch = window
    if use_bos:
        bos = jnp.full((batch.shape[0], 1), bos_token_id, batch.dtype)
        batch = jnp.concatenate([bos, batch], axis=1)
    if scan_layers:
        from asvd4llm_tpu.models.scan_forward import forward_hidden_scan
        hidden = forward_hidden_scan(params, batch, spec)
    else:
        hidden, _ = forward_hidden(params, batch, spec)
    if use_bos:
        hidden = hidden[:, 1:, :]
    logits = apply_lm_head(params, spec, hidden)
    shift_logits = logits[:, :-1, :]
    shift_labels = window[:, 1:]
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    # per-window mean CE [B] (the caller weights / truncates padded rows)
    return -jnp.take_along_axis(logp, shift_labels[..., None],
                                axis=-1)[..., 0].mean(axis=-1)


def evaluate_ppl_windowed(params, spec, token_stream, seqlen: int = 2048,
                          *, use_bos: bool = False, bos_token_id: int = 0,
                          limit: int = -1) -> float:
    """token_stream: [1, N] or [N] concatenated eval tokens.
    Exact reference windowing: nsamples = N // seqlen non-overlapping
    windows; with use_bos the effective window shrinks by 1
    (ref evaluate_utils.py:151-152)."""
    from asvd4llm_tpu.models.scan_forward import can_scan

    toks = np.asarray(token_stream).reshape(-1)
    if use_bos:
        seqlen = seqlen - 1
    nsamples = len(toks) // seqlen
    if limit is not None and 0 < limit + 1 < nsamples:
        # ref breaks AFTER evaluating window i == limit (ref :177-178)
        nsamples = limit + 1
    # homogeneous all-dense models take the scan-layers fast path
    # (O(1)-in-depth compile; numerically identical)
    scan_layers = can_scan(params, spec)
    # batch windows per device call (exact: the metric is a mean of
    # per-window means; the reference runs batch 1, ref :158-159)
    wb = 4
    total = 0.0
    i = 0
    while i < nsamples:
        b = min(wb, nsamples - i)
        rows = toks[i * seqlen:(i + b) * seqlen].reshape(b, seqlen)
        if b < wb and nsamples > wb:
            # pad the remainder batch to the full width so it reuses the
            # already-compiled program (a fresh compile through the TPU
            # tunnel costs minutes); padded rows are dropped below
            rows = np.concatenate([rows, np.repeat(rows[-1:], wb - b, 0)])
        nlls = _window_nll_jit(params, spec, jnp.asarray(rows), use_bos,
                               bos_token_id, scan_layers)
        total += float(np.asarray(nlls)[:b].sum())
        i += b
    # ref: exp(sum(loss*seqlen) / (n*seqlen)) == exp(mean(loss))
    return float(np.exp(total / max(nsamples, 1)))
