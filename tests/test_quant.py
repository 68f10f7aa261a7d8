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


# ------------------------------------------------------------- int4 ----

def test_int4_pack_unpack_roundtrip():
    from asvd4llm_tpu.ops.quant import pack_int4, unpack_int4
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randint(0, 16, size=(8, 1024)), jnp.uint8)
    packed = pack_int4(q)
    assert packed.shape == (8, 512)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)),
                                  np.asarray(q))


def test_int4_grouped_quant_dequant_accuracy():
    from asvd4llm_tpu.ops.quant import (
        dequantize_int4_grouped, quantize_to_int4_grouped,
    )
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(64, 1000).astype(np.float32) * 0.05)
    packed, sc, zs = quantize_to_int4_grouped(w, group=128)
    assert packed.shape == (64, 512)        # cols padded 1000 -> 1024
    assert sc.shape == (64, 8)
    back = dequantize_int4_grouped(packed, sc, zs, group=128)
    # padded cols dequantize to exactly 0
    np.testing.assert_array_equal(np.asarray(back[:, 1000:]), 0.0)
    err = np.abs(np.asarray(back[:, :1000]) - np.asarray(w))
    # 4-bit asym grouped: error bounded by scale/2 per group
    assert err.max() <= float(sc.max()) / 2 + 1e-6
    rel = np.linalg.norm(err) / np.linalg.norm(np.asarray(w))
    # 4-bit on a gaussian: step ~ 8sigma/15 -> RMS rel err ~ 0.12
    assert rel < 0.15


def test_fused_q4_kernel_matches_dequant_oracle():
    """Interpret-mode Pallas q4 kernel vs dequantize-then-XLA oracle."""
    from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply_q4
    from asvd4llm_tpu.ops.quant import (
        dequantize_int4_grouped, quantize_to_int4_grouped,
    )
    from asvd4llm_tpu.ops.lowrank import lowrank_apply

    rng = np.random.RandomState(2)
    M, K, N, R = 4, 640, 520, 140  # deliberately unaligned everywhere
    x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.3)
    a = jnp.asarray(rng.randn(N, R).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(R, K).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(N).astype(np.float32) * 0.1)

    a4, asc, azs = quantize_to_int4_grouped(a, group=128)
    b4, bsc, bzs = quantize_to_int4_grouped(b, group=128)
    Rp = a4.shape[1] * 2
    b4 = jnp.pad(b4, ((0, Rp - R), (0, 0)))
    bsc = jnp.pad(bsc, ((0, Rp - R), (0, 0)))
    bzs = jnp.pad(bzs, ((0, Rp - R), (0, 0)))

    got = fused_lowrank_apply_q4(x, a4, asc, azs, b4, bsc, bzs, bias,
                                 group=128, interpret=True)
    a_dq = dequantize_int4_grouped(a4, asc, azs, group=128)[:, :Rp]
    b_dq = dequantize_int4_grouped(b4, bsc, bzs, group=128)
    Kp = b_dq.shape[1]
    want = lowrank_apply(jnp.pad(x, ((0, 0), (0, Kp - K))), a_dq, b_dq, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    assert got.shape == (M, N)


def test_q4_leaf_through_decoder_and_generate():
    """int4 deployment leaves run through the decoder forward and the
    generation path (XLA fallback on CPU), close to the fp factors."""
    torch = pytest.importorskip("torch")
    import transformers

    from asvd4llm_tpu.models import forward, params_from_torch_model
    from asvd4llm_tpu.models.registry import (
        get_linear, is_q4_lowrank, lowrank_leaf, set_linear,
    )
    from asvd4llm_tpu.ops.asvd import factorize_linear
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int4

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    for key in ("gate_proj", "up_proj"):
        name = f"model.layers.0.mlp.{key}"
        leaf = get_linear(params, spec, name)
        f = factorize_linear(leaf["w"], leaf["b"], 0.9, backend="exact")
        params = set_linear(params, spec, name,
                            lowrank_leaf(f.A, f.B, f.bias))

    q4 = quantize_lowrank_factors_int4(params, spec, group=128)
    assert is_q4_lowrank(get_linear(q4, spec, "model.layers.0.mlp.gate_proj"))

    ids = jnp.asarray(np.random.RandomState(4).randint(0, 128, (1, 10)))
    ref = np.asarray(forward(params, ids, spec))
    got = np.asarray(forward(q4, ids, spec))
    # int4 is lossy; logits stay close and argmax agrees on most positions
    assert np.isfinite(got).all()
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.7, agree

    from asvd4llm_tpu.eval.generate import generate
    out = generate(q4, spec, np.asarray([[1, 2, 3]]), max_new_tokens=4)
    assert out.shape == (1, 7)
