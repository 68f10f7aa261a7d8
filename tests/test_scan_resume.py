"""Per-leaf resume + host-RSS recycling of the sensitivity scan.

Round-5 incident: the canonical full-depth 7B scan leaked ~1.8 GB host RSS
per leaf through the TPU tunnel and was OOM-killed by the HOST kernel after
64 of 225 leaves (utils/hostguard.py docstring). The fix is per-leaf
persistence (calib/sensitivity._append_resume) + process recycling
(hostguard.check → HostBudgetExceeded → supervisor relaunch). These tests
pin the contract: a resumed scan must produce bit-identical results to an
uninterrupted one, at every truncation point.
"""

import json

import jax
import numpy as np
import pytest

from asvd4llm_tpu.calib.sensitivity import calib_sensitivity_ppl
from asvd4llm_tpu.calib.stats import calib_input_distribution
from asvd4llm_tpu.config import ASVDConfig
from asvd4llm_tpu.models.init import init_params
from asvd4llm_tpu.models.spec import llama_spec
from asvd4llm_tpu.utils import hostguard


def _tiny_setup():
    spec = llama_spec(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=4, head_dim=8,
                      max_position_embeddings=96)
    params = init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    loader = [{"input_ids": rng.randint(0, 128, size=(1, 32))}
              for _ in range(2)]
    cfg = ASVDConfig(model_id="t", calib_dataset="synthetic",
                     param_ratio_target=0.9, act_aware=True, alpha=0.5,
                     scaling_method="abs_mean", n_calib_samples=2, seqlen=32,
                     svd_backend="exact", use_cache=False)
    stats = calib_input_distribution(params, spec, loader,
                                     cfg.scaling_method)
    return params, spec, loader, cfg, stats


def _run(params, spec, loader, cfg, stats, resume=None):
    return calib_sensitivity_ppl(params, spec, loader, cfg, stats=stats,
                                 resume=resume)


def test_resume_matches_uninterrupted(tmp_path):
    params, spec, loader, cfg, stats = _tiny_setup()
    base = _run(params, spec, loader, cfg, stats)

    # full scan with persistence
    res = str(tmp_path / "resume.jsonl")
    full = _run(params, spec, loader, cfg, stats, resume=res)
    assert full == base

    lines = open(res).read().strip().splitlines()
    assert len(lines) == len(base)  # one record per leaf incl. lm_head

    # resume from EVERY truncation point (simulating a kill after leaf k):
    # results must be identical — including the RNG-stream alignment for
    # the leaves that are recomputed after the cached prefix
    for k in (1, len(lines) // 2, len(lines) - 1):
        part = str(tmp_path / f"resume_{k}.jsonl")
        with open(part, "w") as f:
            f.write("\n".join(lines[:k]) + "\n")
        out = _run(params, spec, loader, cfg, stats, resume=part)
        assert out == base, f"resume after {k} leaves diverged"

    # full-cover early return (all leaves cached): identical again
    out = _run(params, spec, loader, cfg, stats, resume=res)
    assert out == base


def test_resume_tolerates_torn_tail(tmp_path):
    """A process killed mid-write leaves a torn final JSON line — the
    loader must drop it and the scan recomputes that leaf."""
    params, spec, loader, cfg, stats = _tiny_setup()
    base = _run(params, spec, loader, cfg, stats)
    res = str(tmp_path / "resume.jsonl")
    _run(params, spec, loader, cfg, stats, resume=res)
    lines = open(res).read().strip().splitlines()
    torn = str(tmp_path / "torn.jsonl")
    with open(torn, "w") as f:
        f.write("\n".join(lines[:3]) + "\n" + lines[4][: len(lines[4]) // 2])
    out = _run(params, spec, loader, cfg, stats, resume=torn)
    assert out == base


def test_budget_exceeded_after_persist(tmp_path):
    """hostguard raises only AFTER the finished leaf is on disk, so a
    recycle loses no work: the resume file must already contain every
    leaf completed before the raise."""
    params, spec, loader, cfg, stats = _tiny_setup()
    res = str(tmp_path / "resume.jsonl")
    with pytest.raises(hostguard.HostBudgetExceeded):
        calib_sensitivity_ppl(params, spec, loader, cfg, stats=stats,
                              resume=res, max_rss_gb=0.001)
    recs = [json.loads(x) for x in open(res).read().strip().splitlines()]
    assert len(recs) == 1  # first leaf persisted, then the budget fired
    assert set(recs[0]) == {"name", "li", "dt", "ratios"}

    # and the relaunch completes + matches an uninterrupted run
    base = _run(params, spec, loader, cfg, stats)
    out = _run(params, spec, loader, cfg, stats, resume=res)
    assert out == base


def test_hostguard_trim_and_rss(monkeypatch, tmp_path):
    # isolate from any operator override file on this machine
    monkeypatch.setattr(hostguard, "BUDGET_OVERRIDE_FILE",
                        str(tmp_path / "none"))
    r = hostguard.check(None, "test")  # no budget: never raises
    assert r > 0.01  # a live python process has measurable RSS
    with pytest.raises(hostguard.HostBudgetExceeded):
        hostguard.check(0.001, "test")

    # live override: replaces a SET budget, never turns guarding on
    ov = tmp_path / "ov"
    ov.write_text("99999")
    monkeypatch.setattr(hostguard, "BUDGET_OVERRIDE_FILE", str(ov))
    hostguard.check(0.001, "test")  # raised above; override lifts it
    ov.write_text("0.001")
    with pytest.raises(hostguard.HostBudgetExceeded):
        hostguard.check(99999, "test")
    assert hostguard.check(None, "test") > 0.01  # None stays unguarded


def test_decompose_checkpoint_resume(tmp_path):
    """Final-pass factor checkpointing (calib/search.py resume_dir): a
    second run must load every leaf from disk and produce an identical
    compressed model + manifest; a budget raise mid-pass must leave only
    complete .npz checkpoints behind."""
    from asvd4llm_tpu.calib.search import binary_search_truncation_rank

    params, spec, loader, cfg, stats = _tiny_setup()
    sens = _run(params, spec, loader, cfg, stats)

    base_p, base_m = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats)

    d = str(tmp_path / "factors")
    p1, m1 = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats, resume_dir=d)
    assert m1 == base_m
    import os
    assert len(os.listdir(d)) == len(m1)
    assert not any(f.endswith(".tmp.npz") for f in os.listdir(d))

    # budget raise mid-pass: exactly the persisted leaves survive
    d2 = str(tmp_path / "factors2")
    with pytest.raises(hostguard.HostBudgetExceeded):
        binary_search_truncation_rank(params, spec, sens, loader, cfg,
                                      stats=stats, resume_dir=d2,
                                      max_rss_gb=0.001)
    assert len(os.listdir(d2)) == 1

    # resumed run: loads the checkpoint, recomputes the rest, matches
    p2, m2 = binary_search_truncation_rank(
        params, spec, sens, loader, cfg, stats=stats, resume_dir=d2)
    assert m2 == base_m
    for (la, lb) in ((p1, base_p), (p2, base_p)):
        fa = jax.tree.leaves(la)
        fb = jax.tree.leaves(lb)
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_oom_recovery_ladder(tmp_path):
    """Device-OOM recovery (_grid_eval_oom_safe): round-5 take-2 of the
    canonical run died rc=1 to a TPU RESOURCE_EXHAUSTED at a marginal leaf
    that take-1 had passed (HBM-fragmentation flakiness at ~13.5 GB
    resident). The ladder: in-process gram retry -> persisted marker +
    HostBudgetExceeded recycle -> forced gram on resume -> fatal at 3."""
    from asvd4llm_tpu.calib.sensitivity import (
        _grid_eval_oom_safe, _load_resume)

    res = str(tmp_path / "r.jsonl")

    # 1) one OOM -> in-process retry runs on the gram backend
    calls = []

    def flaky(fb, shrink):
        calls.append((fb, shrink))
        if len(calls) == 1:
            raise RuntimeError("TPU backend error (RESOURCE_EXHAUSTED).")
        return "ok"

    assert _grid_eval_oom_safe(flaky, "leaf.a", res, {}) == "ok"
    assert calls == [(None, 1), ("gram", 4)]

    # 2) persistent OOM -> marker persisted + HostBudgetExceeded (rc=42
    # recycle protocol), NOT the raw error
    def always(fb, shrink):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    oc = {}
    with pytest.raises(hostguard.HostBudgetExceeded):
        _grid_eval_oom_safe(always, "leaf.b", res, oc)
    assert oc["leaf.b"] == 1
    state, oom_counts, _shapes = _load_resume(res)
    assert state == {}  # markers are not finished leaves
    assert oom_counts == {"leaf.b": 1}

    # 3) a resumed attempt forces gram from the first call
    calls2 = []

    def ok(fb, shrink):
        calls2.append((fb, shrink))
        return "ok"

    assert _grid_eval_oom_safe(ok, "leaf.b", res, dict(oom_counts)) == "ok"
    assert calls2 == [("gram", 4)]

    # 4) fifth marked OOM is fatal: the real error propagates (cap 5 —
    # strikes 3/4 give the low-memory gram + shrunk-chunk combinations a
    # clean-heap attempt before the run aborts)
    oc = {"leaf.b": 4}
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        _grid_eval_oom_safe(always, "leaf.b", res, oc)
    # 4b) strike 3 still recycles rather than aborting
    oc = {"leaf.b": 2}
    with pytest.raises(hostguard.HostBudgetExceeded):
        _grid_eval_oom_safe(always, "leaf.b", res, oc)

    # 5) non-OOM errors propagate untouched, no marker
    def broken(fb, shrink):
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        _grid_eval_oom_safe(broken, "leaf.c", res, {})
    _, oom_counts, _shapes = _load_resume(res)
    assert "leaf.c" not in oom_counts


def test_resume_skips_seeded_and_marker_records(tmp_path):
    """Records with "seeded": true are honored as finished leaves (their
    dt is real measured time from an earlier same-config run); marker
    records are skipped by the state loader."""
    from asvd4llm_tpu.calib.sensitivity import _load_resume

    res = str(tmp_path / "r.jsonl")
    with open(res, "w") as f:
        f.write(json.dumps({"name": "x", "li": 0, "dt": 1.5,
                            "ratios": {"0.5": 2.0}, "seeded": True,
                            "dt_source": "log"}) + "\n")
        f.write(json.dumps({"name": "y", "oom": 2}) + "\n")
    state, oom, _shapes = _load_resume(res)
    assert state == {"x": (0, 1.5, {0.5: 2.0})}
    assert oom == {"y": 2}


def test_oom_shape_generalization(tmp_path):
    """Once any leaf of a shape OOMs, every later same-shape leaf is
    forced to the gram backend proactively (one recycle per novel SHAPE,
    not per leaf), in-process and across resumed attempts."""
    from asvd4llm_tpu.calib.sensitivity import (
        _grid_eval_oom_safe, _load_resume)

    res = str(tmp_path / "r.jsonl")
    shapes = set()
    calls = []

    def flaky_once(fb, shrink):
        calls.append((fb, shrink))
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: hbm")
        return "ok"

    # leaf.a (11008x4096) OOMs once, retry succeeds; shape is recorded
    # with a count-0 marker (doesn't count toward the 3-strike limit)
    assert _grid_eval_oom_safe(flaky_once, "l0.gate", res, {},
                               (11008, 4096), shapes) == "ok"
    assert shapes == {(11008, 4096)}
    _, oom_counts, oom_shapes = _load_resume(res)
    assert oom_shapes == {(11008, 4096)}
    assert not oom_counts.get("l0.gate")  # count-0: not a strike

    # same-shape leaf in the SAME process goes straight to gram
    calls2 = []

    def ok(fb, shrink):
        calls2.append((fb, shrink))
        return "ok"

    assert _grid_eval_oom_safe(ok, "l1.gate", res, {},
                               (11008, 4096), shapes) == "ok"
    assert calls2 == [("gram", 4)]

    # ...and in a RESUMED process (shape loaded from the marker)
    calls3 = []
    assert _grid_eval_oom_safe(
        lambda fb, shrink: calls3.append((fb, shrink)) or "ok",
        "l2.gate", res, dict(oom_counts),
        (11008, 4096), set(oom_shapes)) == "ok"
    assert calls3 == [("gram", 4)]

    # a DIFFERENT shape still resolves normally
    calls4 = []
    assert _grid_eval_oom_safe(
        lambda fb, shrink: calls4.append((fb, shrink)) or "ok",
        "l1.down", res, {}, (4096, 11008),
        set(oom_shapes)) == "ok"
    assert calls4 == [(None, 1)]
