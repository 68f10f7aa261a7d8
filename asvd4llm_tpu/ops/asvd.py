"""Activation-aware SVD factorization (the ASVD core op).

Behavioral contract (parity with ref modules/svd_linear.py:26-103):

- rank selection: ``rank = int(out*in*ratio) // (in + out)``, then ceil to a
  multiple of ``rank_align`` (ref :39-44);
- activation-aware scaling: ``s = scaling**alpha * fisher**alpha + 1e-6``,
  weight columns scaled by ``s`` before SVD, V rows divided by ``s`` after
  (ref :48-70);
- sigma fusion into the two factors: "UV" splits sqrt(S) into both, "U"/"V"
  fold S entirely into one side (ref :16-24);
- factorization runs in float32 regardless of model dtype, factors are cast
  back to the model dtype (ref :47,102).

Deviation (deliberate, documented): on SVD failure / NaN the reference
replaces the layer with a *freshly random* nn.Linear (ref :66-68,80-98),
silently destroying that layer. We instead KEEP THE DENSE LAYER (signalled
by returning None), which is strictly safer and is flagged to the caller.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from asvd4llm_tpu.ops.svd import truncated_svd


class LowRankFactors(NamedTuple):
    """Factors of ``w ≈ A @ B`` for a linear ``y = x @ w.T + b``.

    A: [out_features, rank]   (ref ALinear.weight, svd_linear.py:10,17)
    B: [rank, in_features]    (ref BLinear.weight, svd_linear.py:14,18)
    bias: [out_features] or None (carried on the A side, ref :12-13)
    """
    A: jax.Array
    B: jax.Array
    bias: Optional[jax.Array]

    @property
    def rank(self) -> int:
        return self.A.shape[1]

    @property
    def out_features(self) -> int:
        return self.A.shape[0]

    @property
    def in_features(self) -> int:
        return self.B.shape[1]

    def n_params(self) -> int:
        return self.A.size + self.B.size

    def recompose(self) -> jax.Array:
        """Dense ``[out, in]`` reconstruction A @ B (float32)."""
        return (self.A.astype(jnp.float32) @ self.B.astype(jnp.float32))


def rank_for_param_ratio(in_features: int, out_features: int,
                         param_ratio: float, rank_align: int = 1) -> int:
    """Reference rank formula (ref svd_linear.py:39-44)."""
    n_params = in_features * out_features
    compressed_params = int(n_params * param_ratio)
    rank = compressed_params // (in_features + out_features)
    rank = int(math.ceil(rank / rank_align) * rank_align)
    return rank


def build_scaling_vector(scaling_diag: Optional[jax.Array],
                         fisher_info: Optional[jax.Array],
                         alpha: float) -> Optional[jax.Array]:
    """``s = scaling**alpha * fisher**alpha + 1e-6`` (ref svd_linear.py:48-59).

    Either statistic may be absent; with both absent returns None (pure SVD).
    """
    if scaling_diag is None and fisher_info is None:
        return None
    s = jnp.asarray(1.0, dtype=jnp.float32)
    if scaling_diag is not None:
        s = s * scaling_diag.astype(jnp.float32) ** alpha
    if fisher_info is not None:
        s = s * fisher_info.astype(jnp.float32) ** alpha
    return s + 1e-6


def _fuse_sigma(u: jax.Array, s: jax.Array, vh: jax.Array, sigma_fuse: str):
    """Distribute singular values into A=[out,rank], B=[rank,in]
    (ref svd_linear.py:16-24)."""
    if sigma_fuse == "UV":
        sq = jnp.sqrt(s)
        return u * sq[None, :], vh * sq[:, None]
    if sigma_fuse == "U":
        return u * s[None, :], vh
    if sigma_fuse == "V":
        return u, vh * s[:, None]
    raise ValueError(f"unknown sigma_fuse {sigma_fuse!r}")


def factorize_weight(
    w: jax.Array,
    rank: int,
    *,
    scale: Optional[jax.Array] = None,
    sigma_fuse: str = "UV",
    backend: str = "auto",
    key: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Factorize one ``[out, in]`` weight into (A, B), float32.

    Scale-whiten columns by ``scale`` before SVD and fold ``1/scale`` back
    into B (ref svd_linear.py:60,70 — there the fold-back divides V's rows;
    B = Vh here so it divides B's columns).
    """
    w32 = w.astype(jnp.float32)
    if scale is not None:
        w32 = w32 * scale[None, :]
    u, s, vh = truncated_svd(w32, rank, backend=backend, key=key)
    if scale is not None:
        vh = vh / scale[None, :]
    a, b = _fuse_sigma(u, s, vh, sigma_fuse)
    return a, b


def factorize_linear(
    w: jax.Array,
    bias: Optional[jax.Array],
    param_ratio: float,
    *,
    act_aware: bool = False,
    scaling_diag: Optional[jax.Array] = None,
    fisher_info: Optional[jax.Array] = None,
    alpha: float = 0.5,
    sigma_fuse: str = "UV",
    rank_align: int = 1,
    backend: str = "auto",
    key: Optional[jax.Array] = None,
    dtype=None,
) -> Optional[LowRankFactors]:
    """Full ASVD factorization of one linear layer (ref svd_linear.py:26-103).

    Returns None when the factorization is unusable (rank 0 or non-finite
    factors) — caller keeps the dense layer (see module docstring for the
    deviation from the reference's random-Linear fallback).
    """
    out_features, in_features = w.shape
    rank = rank_for_param_ratio(in_features, out_features, param_ratio, rank_align)
    if rank <= 0:
        return None
    rank = min(rank, in_features, out_features)

    scale = None
    if act_aware:
        scale = build_scaling_vector(scaling_diag, fisher_info, alpha)

    a, b = factorize_weight(w, rank, scale=scale, sigma_fuse=sigma_fuse,
                            backend=backend, key=key)

    finite = bool(jnp.isfinite(a).all() and jnp.isfinite(b).all())
    if not finite:
        return None

    dtype = dtype or w.dtype
    return LowRankFactors(
        A=a.astype(dtype),
        B=b.astype(dtype),
        bias=None if bias is None else bias.astype(dtype),
    )
