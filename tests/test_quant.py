"""RTN quantizer parity tests against a numpy re-derivation of the
reference Quantizer math (ref quantization.py:17-144) and torch oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from asvd4llm_tpu.ops.quant import (
    dequantize,
    find_quant_params,
    quantize_to_int,
    rtn_quantize_weight,
)


def numpy_ref_rtn(w, bits):
    """Independent numpy implementation of the reference per-channel
    asymmetric RTN (ref quantization.py:52-137, weight=True path)."""
    maxq = 2 ** bits - 1
    x = w.astype(np.float64)
    xmin = np.minimum(x.min(axis=1), 0)
    xmax = np.maximum(x.max(axis=1), 0)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg], xmax[deg] = -1, 1
    scale = (xmax - xmin) / maxq
    zero = np.round(-xmin / scale)
    q = np.clip(np.round(x / scale[:, None]) + zero[:, None], 0, maxq)
    return (scale[:, None] * (q - zero[:, None])).astype(w.dtype)


@pytest.mark.parametrize("bits", [8, 6, 4])
def test_rtn_matches_numpy_reference(bits):
    rng = np.random.RandomState(42)
    w = rng.randn(64, 96).astype(np.float32)
    ours = np.asarray(rtn_quantize_weight(jnp.asarray(w), bits))
    ref = numpy_ref_rtn(w, bits)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rtn_error_bounded_by_half_step():
    rng = np.random.RandomState(0)
    w = rng.randn(32, 32).astype(np.float32)
    wq = np.asarray(rtn_quantize_weight(jnp.asarray(w), 8))
    qp = find_quant_params(jnp.asarray(w), 8)
    step = np.asarray(qp.scale)
    assert np.all(np.abs(wq - w) <= step / 2 + 1e-6)


def test_rtn_zero_rows():
    w = jnp.zeros((4, 8))
    wq = rtn_quantize_weight(w, 8)
    np.testing.assert_allclose(np.asarray(wq), 0.0, atol=1e-6)


def test_mse_search_not_worse():
    rng = np.random.RandomState(1)
    # heavy-tailed weights where range shrinking helps
    w = rng.standard_t(df=2, size=(16, 256)).astype(np.float32)
    plain = np.asarray(rtn_quantize_weight(jnp.asarray(w), 4, mse=False))
    mse = np.asarray(rtn_quantize_weight(jnp.asarray(w), 4, mse=True))
    err_plain = ((plain - w) ** 2).sum()
    err_mse = ((mse - w) ** 2).sum()
    assert err_mse <= err_plain * 1.0001


def test_int_roundtrip():
    rng = np.random.RandomState(2)
    w = rng.randn(16, 32).astype(np.float32)
    q, qp = quantize_to_int(jnp.asarray(w), 8)
    assert q.dtype == jnp.int8
    wd = np.asarray(dequantize(q, qp))
    fake = np.asarray(rtn_quantize_weight(jnp.asarray(w), 8))
    np.testing.assert_allclose(wd, fake, atol=1e-5)
