"""Regression tests for the consolidated memory planner (utils/membudget).

Round 4's full-depth 32-layer 7B runs hit four OOMs in sequence; each is
replayed here as a planning scenario with the budget/backend mocked to the
real v5e numbers, asserting the planner's decision keeps the peak under
budget (VERDICT r4 item 2). The shapes and residency figures are the ones
from the incident log (STATUS_r4.md / benchmarks/results/pipeline_full_r4.log).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvd4llm_tpu.utils import membudget as mb


def _force_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


# ---------------------------------------------------------------- OOM #4:
# QDWH-SVD workspace at the first MLP leaf (gate_proj 11008x4096, a 180 MB
# f32 matrix) next to the scan's 13.6 GB resident set — the exact path
# must NOT fit, and the gram path MUST.

def test_oom4_qdwh_workspace_at_mlp_leaf(monkeypatch):
    _force_tpu(monkeypatch)
    resident = 13.6e9
    m, n = 11008, 4096
    assert not mb.exact_svd_fits_hbm(m, n, resident_bytes=resident)
    # the gram replacement's workspace (~0.6 GB at this shape) must fit
    # inside the ACTUAL free HBM the incident observed (~2.1 GB: 15.75
    # physical minus the 13.6 resident) — that is why the fallback
    # survived where QDWH died
    assert mb.gram_svd_workspace_bytes(m, n) <= 2.1e9
    # and the planner's exact estimate must exceed the OBSERVED lower
    # bound (the incident proved the true peak exceeds ~12x the matrix
    # bytes: a 180 MB matrix OOMed with ~2.1 GB actually free) with real
    # margin, not equal it (ADVICE r4 medium #2)
    assert mb.exact_svd_workspace_bytes(m, n) > 12 * m * n * 4


def test_exact_fits_when_device_is_quiet(monkeypatch):
    _force_tpu(monkeypatch)
    # same MLP shape with only the stats arrays resident (probe-budget
    # geometry): exact must still be chosen — the fallback is a
    # memory-pressure response, not a blanket demotion
    assert mb.exact_svd_fits_hbm(11008, 4096, resident_bytes=2.0e9)


# ---------------------------------------------------------------- OOM #2/#3:
# grid-vmap candidate temps and the dense candidate stack. At full depth
# the stacked working set + SVD factors left <1.5 GB free; the 6-wide
# candidate grid (6 x 90 MB bf16 MLP candidates + per-candidate HLO
# temps) must be chunked down so modeled temps stay inside free HBM.

def test_oom23_grid_chunk_under_full_depth_residency(monkeypatch):
    _force_tpu(monkeypatch)
    cand_bytes = 11008 * 4096 * 2          # one bf16 MLP candidate
    resident = 13.0e9                       # stack + hidden + factors
    cs = mb.grid_chunk_candidates(6, cand_bytes, resident)
    assert 1 <= cs < 6
    free = mb.HBM_BUDGET - resident
    assert 4 * cand_bytes * cs <= 0.5 * free + 1  # modeled temps fit

    # plenty of headroom (8-layer probe residency) -> no chunking
    assert mb.grid_chunk_candidates(6, cand_bytes, 4.0e9) == 6
    # pathological: near-zero free still streams one at a time, never 0
    assert mb.grid_chunk_candidates(6, cand_bytes, 14.1e9) == 1


# ---------------------------------------------------------------- failure
# mode: the residency query itself failing must be LOUD and must resolve
# to the memory-SAFE branch (ADVICE r4: the old silent `return True`
# would re-run exact QDWH exactly when the guard was needed).

def test_failed_residency_query_is_loud_and_safe(monkeypatch, caplog):
    _force_tpu(monkeypatch)

    def boom():
        raise RuntimeError("axon backend: live_arrays unavailable")

    monkeypatch.setattr(jax, "live_arrays", boom)
    with caplog.at_level(logging.WARNING, logger="asvd4llm_tpu.membudget"):
        assert mb.device_resident_bytes() is None
        assert not mb.exact_svd_fits_hbm(11008, 4096)   # safe: gram
        assert mb.grid_chunk_candidates(6, 11008 * 4096 * 2, None) == 1
    assert any("live-residency query failed" in r.message
               for r in caplog.records)


def test_non_tpu_backends_always_fit():
    # CPU tests and parity paths run the same code; planning only binds
    # on the 16 GB chip
    assert mb.exact_svd_fits_hbm(11008, 4096, resident_bytes=13.6e9) or \
        jax.default_backend() == "tpu"
    assert mb.grid_chunk_candidates(6, 11008 * 4096 * 2, 13.0e9) == 6 or \
        jax.default_backend() == "tpu"


# ---------------------------------------------------------------- the
# trace-time hazard (ADVICE r4 medium #1): truncated_svd must not consult
# live residency under tracing — the decision must come in via the static
# backend arg, resolved eagerly by resolve_backend.

def test_no_residency_query_under_tracing(monkeypatch):
    from asvd4llm_tpu.ops import svd as svd_mod

    queried = {"n": 0}
    real = mb.device_resident_bytes

    def counting():
        queried["n"] += 1
        return real()

    monkeypatch.setattr(mb, "device_resident_bytes", counting)

    @jax.jit
    def inner(w):
        u, s, vh = svd_mod.truncated_svd(w, 8, backend="exact")
        return (u * s[None, :]) @ vh

    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    out = inner(w)
    assert queried["n"] == 0, "residency consulted at trace time"
    assert np.isfinite(np.asarray(out)).all()


def test_resolve_backend_pre_resolves_gram(monkeypatch):
    """resolve_backend is the eager entry point: under memory pressure it
    must turn exact/auto-exact into gram BEFORE any jit boundary."""
    from asvd4llm_tpu.ops import svd as svd_mod

    monkeypatch.setattr(svd_mod, "exact_svd_fits_hbm", lambda m, n: False)
    assert svd_mod.resolve_backend(11008, 4096, 4096, "exact") == "gram"
    # auto at rank >= 0.5*min resolves to exact, then demotes to gram
    assert svd_mod.resolve_backend(11008, 4096, 2560, "auto") == "gram"
    monkeypatch.setattr(svd_mod, "exact_svd_fits_hbm", lambda m, n: True)
    assert svd_mod.resolve_backend(11008, 4096, 4096, "exact") == "exact"
    # randomized is never demoted (its workspace is the sketch, not QDWH)
    assert svd_mod.resolve_backend(11008, 4096, 1024, "auto") == "randomized"


def test_batched_gram_route_chunks_when_tight(monkeypatch):
    """ADVICE r4 low #4: the vmapped gram route materializes
    L*(Gram + eigh workspace + U/S/Vh) at once; when that would not fit,
    batched_truncated_svd must chunk the batch and still return correct
    stacked factors."""
    from asvd4llm_tpu.ops import svd as svd_mod

    L, m, n = 4, 40, 24
    ws = jax.random.normal(jax.random.PRNGKey(1), (L, m, n), jnp.float32)
    # force the gram branch and make the full-vmap workspace "not fit":
    # only batches of <= 2 matrices pass the fit check
    monkeypatch.setattr(svd_mod, "exact_svd_fits_hbm", lambda M, N: False)
    two_fit = 2 * mb.gram_svd_workspace_bytes(m, n)
    monkeypatch.setattr(mb, "fits", lambda b, **kw: b <= two_fit)
    us, ss, vhs = svd_mod.batched_truncated_svd(ws, 8, backend="exact")
    assert us.shape == (L, m, 8) and ss.shape == (L, 8) \
        and vhs.shape == (L, 8, n)
    # parity with the unbatched gram factorization
    for i in range(L):
        u1, s1, v1 = svd_mod.truncated_svd(ws[i], 8, backend="gram")
        np.testing.assert_allclose(np.asarray(ss[i]), np.asarray(s1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray((us[i] * ss[i][None, :]) @ vhs[i]),
            np.asarray((u1 * s1[None, :]) @ v1), rtol=1e-3, atol=1e-4)
