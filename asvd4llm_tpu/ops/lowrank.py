"""Low-rank and dense linear application.

The compressed forward replaces one GEMM ``y = x @ W.T + b`` with two
(ref svd_linear.py:105-109): ``y = (x @ B.T) @ A.T + b``. It wins whenever
``rank < in*out/(in+out)`` — exactly the regime the rank formula enforces.

Two execution paths:
- XLA dot-dot (this module): correctness reference; XLA already fuses the
  bias and keeps the rank-dim intermediate out of HBM for small batches.
- fused Pallas kernel (ops/pallas_lowrank.py): streams A and B tiles
  HBM→VMEM with the rank intermediate resident in VMEM; used on TPU for
  the bandwidth-bound decode shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dense_apply(x: jax.Array, w: jax.Array, bias: Optional[jax.Array] = None,
                ) -> jax.Array:
    """``y = x @ w.T + b`` with f32 MXU accumulation."""
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def lowrank_apply(x: jax.Array, a: jax.Array, b: jax.Array,
                  bias: Optional[jax.Array] = None, *,
                  use_pallas: bool = False) -> jax.Array:
    """``y = (x @ B.T) @ A.T + b`` (ref svd_linear.py:105-109).

    a: [out, rank], b: [rank, in], x: [..., in] -> [..., out]
    """
    if use_pallas:
        from asvd4llm_tpu.ops.pallas_lowrank import fused_lowrank_apply
        return fused_lowrank_apply(x, a, b, bias)
    t = jax.lax.dot_general(
        x, b,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = jax.lax.dot_general(
        t, a,
        dimension_numbers=(((t.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
