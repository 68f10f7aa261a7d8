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


def test_prepadded_codes_match_unpadded():
    """prepad_quantized_leaves pads ONLY code arrays; the apply must
    return identical results on both the kernel path (interpret) and the
    XLA fallback, with tiles chosen to make every runtime pad a no-op."""
    import jax

    from asvd4llm_tpu.ops.pallas_lowrank import (
        _pad2, _pick_tile, fused_lowrank_apply_q8,
    )
    from asvd4llm_tpu.ops.quant import quantize_to_int

    M, K, N, R = 8, 384, 200, 72   # deliberately unaligned N/R
    x = jax.random.normal(jax.random.PRNGKey(20), (M, K), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(21), (N, R)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(22), (R, K)) * 0.1
    a8, a_qp = quantize_to_int(a, 8)
    b8, b_qp = quantize_to_int(b, 8)

    ref_i = fused_lowrank_apply_q8(x, a8, a_qp, b8, b_qp, interpret=True)
    ref_x = fused_lowrank_apply_q8(jnp.tile(x, (200, 1)), a8, a_qp, b8,
                                   b_qp)  # M>cap -> XLA fallback

    a8p = _pad2(a8, 512, 128)
    b8p = _pad2(b8, 128, 512)
    out_i = fused_lowrank_apply_q8(x, a8p, a_qp, b8p, b_qp, interpret=True)
    out_x = fused_lowrank_apply_q8(jnp.tile(x, (200, 1)), a8p, a_qp, b8p,
                                   b_qp)
    assert out_i.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               atol=1e-6, rtol=1e-6)


def test_pick_tile_divides_or_none():
    from asvd4llm_tpu.ops.pallas_lowrank import _pick_tile
    assert _pick_tile(4096, 512) == 512
    assert _pick_tile(4096, 2048) == 2048
    assert _pick_tile(11264, 1024) == 1024   # pre-padded 11008
    assert _pick_tile(11008, 512) == 256     # unpadded: 128*86
    assert _pick_tile(128, 512) == 128
    assert _pick_tile(7 * 128, 512) == 128   # 128*7: no larger 128-mult divides
    assert _pick_tile(127, 512) is None


def test_prepad_quantized_leaves_engine_private():
    """prepad pads codes to the tile grid and leaves scales/bias at true
    dims; non-quantized leaves pass through untouched."""
    from asvd4llm_tpu.models.init import init_params
    from asvd4llm_tpu.models.spec import llama_spec
    from asvd4llm_tpu.ops.pallas_lowrank import prepad_quantized_leaves
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int8
    from asvd4llm_tpu.ops.asvd import factorize_linear

    spec = llama_spec(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=32)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lay = params["layers"][0]
    f = factorize_linear(np.asarray(lay["up_proj"]["w"]), None, 0.9,
                         act_aware=False, rank_align=8)
    lay["up_proj"] = {"A": f.A, "B": f.B, "b": None}
    q = quantize_lowrank_factors_int8(params, spec)
    p = prepad_quantized_leaves(q, spec)
    leaf = p["layers"][0]["up_proj"]
    assert leaf["A8"].shape[0] % 512 == 0 and leaf["A8"].shape[1] % 128 == 0
    assert leaf["B8"].shape[1] % 512 == 0
    assert leaf["Asc"].shape[0] == 48      # true N preserved in scales
    # the original pytree is untouched
    assert q["layers"][0]["up_proj"]["A8"].shape[0] == 48
