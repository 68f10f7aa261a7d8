"""Unit tests for the ASVD factorization math (ops/asvd.py, ops/svd.py).

Parity anchors:
- rank formula vs the reference expression (ref svd_linear.py:39-44),
- sigma-fusion algebra A @ B == U S Vh for all three fuse modes,
- scale/unscale round-trip: act-aware factors still approximate W,
- randomized SVD vs exact SVD reconstruction error,
- torch.svd_lowrank cross-check (torch is CPU-only here, used purely as an
  independent oracle).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvd4llm_tpu.ops.asvd import (
    LowRankFactors,
    build_scaling_vector,
    factorize_linear,
    factorize_weight,
    rank_for_param_ratio,
)
from asvd4llm_tpu.ops.svd import (
    batched_truncated_svd,
    randomized_svd,
    singular_values,
    truncated_svd,
)


def ref_rank(in_f, out_f, ratio, align=1):
    # reference expression, re-derived (ref svd_linear.py:39-44)
    compressed = int(in_f * out_f * ratio)
    r = compressed // (in_f + out_f)
    return int(math.ceil(r / align) * align)


@pytest.mark.parametrize("in_f,out_f,ratio,align", [
    (768, 768, 0.9, 1),
    (768, 3072, 0.5, 1),
    (4096, 11008, 0.85, 128),
    (512, 512, 0.4, 8),
    (128, 64, 0.1, 1),
])
def test_rank_formula_parity(in_f, out_f, ratio, align):
    assert rank_for_param_ratio(in_f, out_f, ratio, align) == ref_rank(in_f, out_f, ratio, align)


def test_exact_truncated_svd_reconstructs_lowrank_matrix():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (64, 16))
    b = jax.random.normal(k2, (16, 96))
    w = a @ b  # exactly rank 16
    u, s, vh = truncated_svd(w, 16, backend="exact")
    np.testing.assert_allclose(np.asarray(u @ jnp.diag(s) @ vh),
                               np.asarray(w), atol=1e-3, rtol=1e-3)


def test_randomized_svd_matches_exact_on_decaying_spectrum():
    key = jax.random.PRNGKey(1)
    m, n, r = 256, 384, 32
    ku, kv = jax.random.split(key)
    u0, _ = jnp.linalg.qr(jax.random.normal(ku, (m, r)))
    v0, _ = jnp.linalg.qr(jax.random.normal(kv, (n, r)))
    s0 = jnp.exp(-jnp.arange(r) / 4.0)  # fast decay
    w = (u0 * s0) @ v0.T
    ue, se, vhe = truncated_svd(w, 16, backend="exact")
    ur, sr, vhr = randomized_svd(w, 16, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(sr), np.asarray(se), rtol=1e-3)
    we = ue @ jnp.diag(se) @ vhe
    wr = ur @ jnp.diag(sr) @ vhr
    np.testing.assert_allclose(np.asarray(wr), np.asarray(we), atol=1e-4)


def test_randomized_svd_transposed_side():
    # m < n triggers the transpose branch
    w = jax.random.normal(jax.random.PRNGKey(3), (48, 200))
    u, s, vh = randomized_svd(w, 8, key=jax.random.PRNGKey(4))
    assert u.shape == (48, 8) and s.shape == (8,) and vh.shape == (8, 200)
    ue, se, vhe = truncated_svd(w, 8, backend="exact")
    np.testing.assert_allclose(np.asarray(s), np.asarray(se), rtol=1e-2)


@pytest.mark.parametrize("fuse", ["UV", "U", "V"])
def test_sigma_fuse_algebra(fuse):
    """A @ B must equal U S Vh regardless of how sigma is distributed
    (ref svd_linear.py:16-24)."""
    w = jax.random.normal(jax.random.PRNGKey(5), (40, 56))
    a, b = factorize_weight(w, 40, sigma_fuse=fuse, backend="exact")
    np.testing.assert_allclose(np.asarray(a @ b), np.asarray(w),
                               atol=1e-3, rtol=1e-3)


def test_scaling_vector(monkeypatch=None):
    scaling = jnp.array([1.0, 4.0, 9.0])
    fisher = jnp.array([16.0, 25.0, 36.0])
    s = build_scaling_vector(scaling, None, 0.5)
    np.testing.assert_allclose(np.asarray(s), [1 + 1e-6, 2 + 1e-6, 3 + 1e-6], rtol=1e-6)
    s2 = build_scaling_vector(scaling, fisher, 0.5)
    np.testing.assert_allclose(np.asarray(s2), [4 + 1e-6, 10 + 1e-6, 18 + 1e-6], rtol=1e-6)
    assert build_scaling_vector(None, None, 0.5) is None


def test_act_aware_roundtrip_full_rank():
    """With full rank, act-aware scale/unscale must reconstruct W exactly:
    (W·s) = U S Vh  =>  A @ (B/s·s) == W (ref svd_linear.py:60,70)."""
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(key, (32, 48))
    scaling = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (48,))) + 0.1
    a, b = factorize_weight(w, 32, scale=scaling, backend="exact")
    np.testing.assert_allclose(np.asarray(a @ b), np.asarray(w),
                               atol=1e-3, rtol=1e-3)


def test_act_aware_changes_truncated_solution():
    """At truncated rank, act-aware factors differ from plain factors and
    better approximate the scaled directions."""
    w = jax.random.normal(jax.random.PRNGKey(8), (64, 64))
    scale = jnp.ones((64,)).at[0].set(100.0)
    a0, b0 = factorize_weight(w, 8, backend="exact")
    a1, b1 = factorize_weight(w, 8, scale=scale, backend="exact")
    err0 = np.abs(np.asarray((a0 @ b0 - w))[:, 0]).mean()
    err1 = np.abs(np.asarray((a1 @ b1 - w))[:, 0]).mean()
    assert err1 < err0  # scaled column approximated better


def test_factorize_linear_rank_zero_returns_none():
    w = jnp.ones((4, 4))
    assert factorize_linear(w, None, 0.01) is None


def test_factorize_linear_shapes_dtype_and_bias():
    w = jax.random.normal(jax.random.PRNGKey(9), (32, 48), dtype=jnp.bfloat16)
    bias = jnp.ones((32,), dtype=jnp.bfloat16)
    f = factorize_linear(w, bias, 0.5, rank_align=4)
    assert isinstance(f, LowRankFactors)
    expected_rank = rank_for_param_ratio(48, 32, 0.5, 4)
    assert f.A.shape == (32, expected_rank)
    assert f.B.shape == (expected_rank, 48)
    assert f.A.dtype == jnp.bfloat16
    assert f.bias is not None and f.bias.shape == (32,)
    assert f.n_params() == expected_rank * (32 + 48)


def test_torch_svd_lowrank_cross_check():
    """Our randomized SVD and torch.svd_lowrank (the reference's backend,
    ref svd_linear.py:65) should agree on singular values of a benign matrix."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w_np = (rng.randn(96, 128) * np.exp(-np.arange(128) / 20.0)[None, :]).astype(np.float32)
    rank = 24
    ut, st, vt = torch.svd_lowrank(torch.from_numpy(w_np), q=rank, niter=4)
    uj, sj, vhj = randomized_svd(jnp.asarray(w_np), rank, key=jax.random.PRNGKey(0))
    s_exact = np.linalg.svd(w_np, compute_uv=False)[:rank]
    # ours must match the exact spectrum tightly
    np.testing.assert_allclose(np.asarray(sj), s_exact, rtol=1e-3)
    # and our truncation error must be no worse than torch's
    wt = (ut * st).numpy() @ vt.numpy().T
    wj = np.asarray(uj @ jnp.diag(sj) @ vhj)
    err_torch = np.linalg.norm(wt - w_np)
    err_ours = np.linalg.norm(wj - w_np)
    assert err_ours <= err_torch * 1.01


def test_batched_svd_matches_loop():
    ws = jax.random.normal(jax.random.PRNGKey(10), (3, 32, 40))
    us, ss, vhs = batched_truncated_svd(ws, 8, backend="exact")
    for i in range(3):
        _, s_i, _ = truncated_svd(ws[i], 8, backend="exact")
        np.testing.assert_allclose(np.asarray(ss[i]), np.asarray(s_i), rtol=1e-5)


def test_singular_values_stable_rank():
    w = jax.random.normal(jax.random.PRNGKey(11), (64, 64))
    sv = singular_values(w)
    fro2 = float(jnp.sum(w.astype(jnp.float32) ** 2))
    # ref sensitivity.py:100-104: sr = (fro^2 / sigma_max^2)^0.5
    sr = (fro2 / float(sv[0]) ** 2) ** 0.5
    assert 1.0 <= sr <= 64.0
    np.testing.assert_allclose(fro2, float(jnp.sum(sv ** 2)), rtol=1e-4)


def test_gram_truncated_svd_error_bound():
    """The lm_head Gram path (ops/svd.py::_gram_truncated_svd) squares the
    condition number — pin its accuracy vs the direct SVD on a decaying
    known spectrum: singular values above the f32 sqrt(eps) floor match to
    1e-3 rel, and the rank-r recomposition is within 1% of optimal."""
    from asvd4llm_tpu.ops.svd import _gram_truncated_svd

    m, n, rank = 512, 64, 24
    ku, kv = jax.random.split(jax.random.PRNGKey(13))
    u0, _ = jnp.linalg.qr(jax.random.normal(ku, (m, n), jnp.float32))
    v0, _ = jnp.linalg.qr(jax.random.normal(kv, (n, n), jnp.float32))
    s_true = jnp.arange(1, n + 1, dtype=jnp.float32) ** jnp.float32(-1.0)
    w = (u0 * s_true[None, :]) @ v0.T

    u, s, vh = _gram_truncated_svd(w, rank)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_true[:rank]),
                               rtol=1e-3)
    resid = float(jnp.linalg.norm(w - (u * s[None, :]) @ vh))
    optimal = float(jnp.sqrt(jnp.sum(s_true[rank:] ** 2)))
    assert resid <= optimal * 1.01, (resid, optimal)

    # and against the direct SVD factors themselves
    ud, sd, vhd = truncated_svd(w, rank, backend="exact")
    np.testing.assert_allclose(np.asarray(s), np.asarray(sd), rtol=1e-3)
    resid_direct = float(jnp.linalg.norm(w - (ud * sd[None, :]) @ vhd))
    assert abs(resid - resid_direct) <= 0.01 * resid_direct + 1e-6


def test_gram_backend_both_orientations_match_exact():
    """truncated_svd(backend="gram") must reconstruct as well as exact at
    truncation ranks, in both orientations (the full-depth scan swaps it
    in for 11008x4096 AND 4096x11008 leaves when HBM is tight)."""
    from asvd4llm_tpu.ops.svd import truncated_svd

    key = jax.random.PRNGKey(3)
    for shape in [(96, 40), (40, 96)]:
        w = jax.random.normal(key, shape, dtype=jnp.float32)
        for rank in (8, 24):
            ug, sg, vg = truncated_svd(w, rank, backend="gram")
            ue, se, ve = truncated_svd(w, rank, backend="exact")
            rec_g = (ug * sg[None, :]) @ vg
            rec_e = (ue * se[None, :]) @ ve
            err_g = float(jnp.linalg.norm(w - rec_g))
            err_e = float(jnp.linalg.norm(w - rec_e))
            # relative bound (gram's squared conditioning can legitimately
            # differ slightly across backends; an absolute 1e-3 slack on
            # O(10) Frobenius residuals was implicitly ~1e-4 relative)
            w_norm = float(jnp.linalg.norm(w))
            assert err_g <= err_e * (1 + 1e-4) + 1e-6 * w_norm
            assert jnp.allclose(sg, se, rtol=1e-4, atol=1e-4)


def test_exact_falls_back_to_gram_under_memory_pressure(monkeypatch):
    """When exact_svd_fits_hbm says no, backend="exact" must route to the
    Gram program (the full-depth 32-layer scan OOMed in QDWH-SVD with
    13.6 GB resident; this is the regression guard for that fix)."""
    from asvd4llm_tpu.ops import svd as svd_mod

    calls = {"gram": 0, "exact": 0}
    real_gram, real_exact = svd_mod._gram_svd_full, svd_mod._exact_truncated_svd

    def fake_gram(w):
        calls["gram"] += 1
        return real_gram(w)

    def fake_exact(w, rank):
        calls["exact"] += 1
        return real_exact(w, rank)

    monkeypatch.setattr(svd_mod, "_gram_svd_full", fake_gram)
    monkeypatch.setattr(svd_mod, "_exact_truncated_svd", fake_exact)
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)

    monkeypatch.setattr(svd_mod, "exact_svd_fits_hbm", lambda m, n: False)
    svd_mod.truncated_svd(w, 16, backend="exact")
    assert calls == {"gram": 1, "exact": 0}

    monkeypatch.setattr(svd_mod, "exact_svd_fits_hbm", lambda m, n: True)
    svd_mod.truncated_svd(w, 16, backend="exact")
    assert calls == {"gram": 1, "exact": 1}


def test_gram_lowmem_matches_full():
    """gram_truncated_svd_lowmem (the in-jit grid-factors path; row-blocked
    f32 Gram over the resident bf16 weight, rank-sliced back-multiply)
    must reconstruct identically to the materialize-then-full-gram path —
    it exists purely to cut ~360 MB of peak transient at the canonical
    scan's HBM margin (round-5 clean-heap OOMs at 13.05 GB resident)."""
    import jax
    import jax.numpy as jnp

    from asvd4llm_tpu.ops.svd import _gram_svd_full, gram_truncated_svd_lowmem

    k = jax.random.PRNGKey(0)
    for (m, n) in [(688, 256), (256, 688)]:
        w = (jax.random.normal(k, (m, n), jnp.float32) * 0.02).astype(
            jnp.bfloat16)
        scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n,))) + 0.5
        rank = 96
        u, s, vh = gram_truncated_svd_lowmem(w, scale, rank, block=100)
        assert u.shape == (m, rank) and vh.shape == (rank, n)
        ws = w.astype(jnp.float32) * scale[None, :]
        u2, s2, vh2 = _gram_svd_full(ws)
        rec1 = (u * s[None, :]) @ vh
        rec2 = (u2[:, :rank] * s2[:rank][None, :]) @ vh2[:rank, :]
        err = float(jnp.linalg.norm(rec1 - rec2) / jnp.linalg.norm(rec2))
        assert err < 1e-3, (m, n, err)
        # jit-traced (the _grid_factors context): no tracer leaks
        ju, js, jvh = jax.jit(
            lambda a, b: gram_truncated_svd_lowmem(a, b, rank, block=100)
        )(w, scale)
        assert float(jnp.max(jnp.abs(js - s))) < 1e-4
