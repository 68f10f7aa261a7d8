"""Edge-path coverage: padding masks, the alpaca calib loader, use_bos
through the pipeline evaluator, profiling trace smoke."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.models import forward, params_from_torch_model  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return model, params, spec


def test_pad_mask_matches_torch_attention_mask(tiny):
    """Right-padding with pad_mask must match torch's attention_mask for
    the unpadded positions."""
    model, params, spec = tiny
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0  # row 0: only 9 real tokens
    with torch.no_grad():
        ref = model(torch.from_numpy(ids.copy()),
                    attention_mask=torch.from_numpy(mask.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec,
                              pad_mask=jnp.asarray(mask)))
    # compare only non-pad positions (padded-position logits are undefined)
    np.testing.assert_allclose(ours[0, :9], ref[0, :9], atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(ours[1], ref[1], atol=3e-4, rtol=1e-3)


def test_alpaca_calib_loader(tmp_path, monkeypatch):
    """Chat-format calibration path, reference-exact semantics (ref
    datautils.py:126-139): rows are sampled from the FULL list and only
    then filtered to input=="" (may yield < nsamples), and the template's
    double-braced placeholders are ESCAPED by .format, so every sample is
    the same literal string. fixed_alpaca_template=True substitutes for
    real."""
    import random as pyrandom

    from asvd4llm_tpu.data.datasets import get_calib_data

    data = [{"instruction": f"Do thing {i}", "input": "",
             "output": f"Result {i}"} for i in range(6)]
    data.append({"instruction": "skip me", "input": "has input",
                 "output": "x"})
    os.makedirs(tmp_path / "data", exist_ok=True)
    with open(tmp_path / "data" / "alpaca_data.json", "w") as f:
        json.dump(data, f)
    monkeypatch.chdir(tmp_path)

    class Tok:
        def __call__(self, s):
            return {"input_ids": [2 + (ord(c) % 100) for c in s]}

    loader = get_calib_data("alpaca", Tok(), "m", 5, seqlen=64, seed=3,
                            cache_dir=str(tmp_path / "cache"))
    expect = [d for d in pyrandom.Random(3).sample(data, 5)
              if d.get("input", "") == ""]
    assert len(loader) == len(expect) > 0
    for b in loader:
        assert b["input_ids"].shape[0] == 1
        assert b["input_ids"].shape[1] <= 64
        # escaped-brace quirk: every sample renders identically
        assert (b["input_ids"] == loader[0]["input_ids"]).all()

    # seqlen large enough that the substituted instruction (which sits
    # after the ~130-char fixed preamble) survives truncation
    fixed = get_calib_data("alpaca", Tok(), "m-fixed", 5, seqlen=256, seed=3,
                           cache_dir=str(tmp_path / "cache"),
                           fixed_alpaca_template=True)
    assert len(fixed) == len(expect)
    assert any((b["input_ids"].shape != fixed[0]["input_ids"].shape)
               or (b["input_ids"] != fixed[0]["input_ids"]).any()
               for b in fixed[1:])


def test_alpaca_calib_differential_vs_reference(tmp_path, monkeypatch):
    """Side-by-side with the reference's own loader (ref
    datautils.py:126-139) on a synthetic alpaca_data.json: identical
    sampled rows, identical (escaped-template) strings, identical token
    batches."""
    import random as pyrandom

    from asvd4llm_tpu.data.datasets import get_calib_data
    from asvd4llm_tpu.tools.differential import (
        REFERENCE_PATH, reference_available,
    )

    if not reference_available():
        import pytest
        pytest.skip("reference tree unavailable")
    import sys

    sys.path.insert(0, REFERENCE_PATH)
    try:
        import datautils as ref_data
    finally:
        sys.path.remove(REFERENCE_PATH)

    data = [{"instruction": f"Task number {i} with text", "input": "",
             "output": f"Answer {i}"} for i in range(9)]
    data.insert(2, {"instruction": "filtered", "input": "ctx", "output": "y"})
    os.makedirs(tmp_path / "data", exist_ok=True)
    with open(tmp_path / "data" / "alpaca_data.json", "w") as f:
        json.dump(data, f)
    monkeypatch.chdir(tmp_path)

    class Tok:
        def __call__(self, s, return_tensors=None):
            ids = [2 + (ord(c) % 113) for c in s]
            if return_tensors == "pt":
                import torch
                from types import SimpleNamespace
                return SimpleNamespace(input_ids=torch.tensor([ids]))
            return {"input_ids": ids}

    # the reference samples with the GLOBAL random module (its seed arg
    # only keys the cache file); seed it to match our seeded rng
    pyrandom.seed(11)
    ref_batches = ref_data.get_calib_data("alpaca", Tok(), "m", 6,
                                          seqlen=64, seed=11)
    ours = get_calib_data("alpaca", Tok(), "m", 6, seqlen=64, seed=11,
                          cache_dir=str(tmp_path / "cache"),
                          use_cache=False)
    assert len(ours) == len(ref_batches) > 0
    for ob, rb in zip(ours, ref_batches):
        assert (ob["input_ids"] == rb["input_ids"].numpy()).all()


def test_use_bos_pipeline_evaluate(tiny, tmp_path):
    """use_bos through pipeline.evaluate: shrinks the window and prepends
    BOS (ref evaluate_utils.py:151-166)."""
    from asvd4llm_tpu.config import ASVDConfig
    from asvd4llm_tpu.pipeline import evaluate

    _, params, spec = tiny

    class Tok:
        bos_token_id = 1

    cfg = ASVDConfig(model_id="t", eval_ppl="synthetic", seqlen=32,
                     use_bos=True, cache_dir=str(tmp_path),
                     output_dir=str(tmp_path))
    # keep it small: patch the synthetic eval length
    import asvd4llm_tpu.pipeline as pl
    import asvd4llm_tpu.data.datasets as ds
    orig = ds.get_eval_tokens
    def small(*a, **kw):
        kw["synthetic_len"] = 32 * 6
        return orig(*a, **kw)
    pl.get_eval_tokens = small
    try:
        results = evaluate(params, spec, Tok(), cfg)
    finally:
        pl.get_eval_tokens = orig
    assert np.isfinite(results["synthetic"])


def test_device_trace_smoke(tmp_path):
    from asvd4llm_tpu.utils.profiling import device_trace
    with device_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.exists(tmp_path / "trace")
