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
    """Chat-format calibration path (ref datautils.py:126-139)."""
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
            return {"input_ids": [2 + (ord(c) % 100) for c in s][:64]}

    loader = get_calib_data("alpaca", Tok(), "m", 3, seqlen=64,
                            cache_dir=str(tmp_path / "cache"))
    assert len(loader) == 3
    for b in loader:
        assert b["input_ids"].shape[0] == 1
        assert b["input_ids"].shape[1] <= 64


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
