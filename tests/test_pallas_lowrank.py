"""Fused low-rank Pallas kernel: correctness in interpret mode on CPU
(the real-TPU run happens in bench.py on the hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asvd4llm_tpu.ops.lowrank import lowrank_apply
from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply


@pytest.mark.parametrize("M,K,N,R", [
    (4, 256, 512, 64),      # decode-ish
    (8, 512, 384, 128),     # N not multiple of tile
    (3, 300, 200, 50),      # nothing aligned
    (16, 1024, 1024, 256),  # multiple K/N tiles
])
def test_fused_matches_xla(M, K, N, R):
    key = jax.random.PRNGKey(0)
    kx, ka, kb, kbias = jax.random.split(key, 4)
    x = jax.random.normal(kx, (M, K), dtype=jnp.float32)
    a = jax.random.normal(ka, (N, R), dtype=jnp.float32) * 0.1
    b = jax.random.normal(kb, (R, K), dtype=jnp.float32) * 0.1
    bias = jax.random.normal(kbias, (N,), dtype=jnp.float32)

    ref = lowrank_apply(x, a, b, bias)
    out = fused_lowrank_apply(x, a, b, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_3d_input_no_bias():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 5, 192))
    a = jax.random.normal(jax.random.PRNGKey(2), (256, 32)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(3), (32, 192)) * 0.1
    ref = lowrank_apply(x, a, b, None)
    out = fused_lowrank_apply(x, a, b, None, interpret=True)
    assert out.shape == (2, 5, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_bf16():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (8, 256), dtype=jnp.bfloat16)
    a = (jax.random.normal(jax.random.PRNGKey(5), (128, 32)) * 0.1).astype(jnp.bfloat16)
    b = (jax.random.normal(jax.random.PRNGKey(6), (32, 256)) * 0.1).astype(jnp.bfloat16)
    ref = lowrank_apply(x, a, b, None)
    out = fused_lowrank_apply(x, a, b, None, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.05, rtol=0.05)


def test_prefill_falls_back_to_xla():
    # M > max_tokens routes to XLA; just confirm identical results and no error
    x = jax.random.normal(jax.random.PRNGKey(7), (2048, 64))
    a = jax.random.normal(jax.random.PRNGKey(8), (96, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(9), (16, 64)) * 0.1
    ref = lowrank_apply(x, a, b, None)
    out = fused_lowrank_apply(x, a, b, None, interpret=True, max_tokens=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_q8_matches_dequantized_xla():
    from asvd4llm_tpu.ops.quant import quantize_to_int, dequantize
    from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply_q8

    key = jax.random.PRNGKey(10)
    M, K, N, R = 8, 384, 256, 64
    x = jax.random.normal(key, (M, K), dtype=jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(11), (N, R)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(12), (R, K)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(13), (N,))
    a8, a_qp = quantize_to_int(a, 8)
    b8, b_qp = quantize_to_int(b, 8)

    ref = lowrank_apply(x, dequantize(a8, a_qp), dequantize(b8, b_qp), bias)
    out = fused_lowrank_apply_q8(x, a8, a_qp, b8, b_qp, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
    # and it's close to the unquantized op (int8 error only)
    full = lowrank_apply(x, a.astype(jnp.float32), b.astype(jnp.float32), bias)
    rel = float(jnp.linalg.norm(out - full) / jnp.linalg.norm(full))
    assert rel < 0.05


def test_fused_q8_unaligned_rank():
    from asvd4llm_tpu.ops.quant import quantize_to_int, dequantize
    from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply_q8

    M, K, N, R = 3, 200, 130, 50
    x = jax.random.normal(jax.random.PRNGKey(14), (M, K))
    a = jax.random.normal(jax.random.PRNGKey(15), (N, R)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(16), (R, K)) * 0.1
    a8, a_qp = quantize_to_int(a, 8)
    b8, b_qp = quantize_to_int(b, 8)
    ref = lowrank_apply(x, dequantize(a8, a_qp), dequantize(b8, b_qp), None)
    out = fused_lowrank_apply_q8(x, a8, a_qp, b8, b_qp, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
