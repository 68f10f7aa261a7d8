

def test_attn_precision_dtype_rule():
    """f32 operands pin HIGHEST (true-f32 parity dots); bf16 operands get
    DEFAULT (native MXU path, no upcast-multipass risk)."""
    import jax
    import jax.numpy as jnp
    from asvd4llm_tpu.models.decoder import attn_precision

    assert attn_precision(jnp.float32) == jax.lax.Precision.HIGHEST
    assert attn_precision(jnp.bfloat16) == jax.lax.Precision.DEFAULT
    assert attn_precision(jnp.dtype("float32")) == jax.lax.Precision.HIGHEST
    assert attn_precision(jnp.dtype("bfloat16")) == jax.lax.Precision.DEFAULT
