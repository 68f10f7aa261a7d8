"""Tools tests: selfgen sampling, MMLU aggregation, sweep presets,
profiling phases."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402
from asvd4llm_tpu.tools.aggregate import aggregate_mmlu  # noqa: E402
from asvd4llm_tpu.tools.selfgen import gen_calib_set, sample_generate  # noqa: E402
from asvd4llm_tpu.tools.sweep import PRESETS, run_sweep  # noqa: E402
from asvd4llm_tpu.utils.profiling import phase, phase_report, reset_phases  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


def test_sample_generate_shapes_and_determinism(tiny):
    import jax
    params, spec = tiny
    seed = np.asarray([[5, 7]], np.int32)
    a = sample_generate(params, spec, seed, n_tokens=10,
                        key=jax.random.PRNGKey(3))
    b = sample_generate(params, spec, seed, n_tokens=10,
                        key=jax.random.PRNGKey(3))
    c = sample_generate(params, spec, seed, n_tokens=10,
                        key=jax.random.PRNGKey(4))
    assert a.shape == (1, 12)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # different key -> different sample
    assert (a[:, :2] == seed).all()


def test_gen_calib_set_cache(tiny, tmp_path):
    params, spec = tiny

    class Tok:
        def encode(self, s):
            return [3, 4]

    loader = gen_calib_set(params, spec, Tok(), "m", nsamples=2, seqlen=16,
                           cache_dir=str(tmp_path))
    assert len(loader) == 2
    assert loader[0]["input_ids"].shape == (1, 16)
    again = gen_calib_set(params, spec, Tok(), "m", nsamples=2, seqlen=16,
                          cache_dir=str(tmp_path))
    np.testing.assert_array_equal(loader[1]["input_ids"],
                                  again[1]["input_ids"])


def test_aggregate_mmlu(tmp_path):
    path = tmp_path / "results.jsonl"
    rec = {"results": {
        "hendrycksTest-anatomy": {"acc": 0.5},
        "hendrycksTest-virology": {"acc": 0.7},
        "wikitext2": 12.3,
    }}
    path.write_text(json.dumps(rec) + "\n")
    out = aggregate_mmlu(str(path))
    assert out["n_tasks"] == 2
    assert out["mean_acc"] == pytest.approx(0.6)


def test_sweep_presets_and_dry_run():
    cfgs = PRESETS["kv_cache"]("m")
    assert len(cfgs) == 8 and all(c.compress_kv_cache for c in cfgs)
    assert cfgs[0].kv_cache_ratio_target == 0.9

    qcfgs = PRESETS["quantize"]("m")
    assert len(qcfgs) == 12
    assert all(c.rank_align == 128 for c in qcfgs)

    out = run_sweep(cfgs[:2], dry_run=True)
    assert len(out) == 2 and all(r["dry_run"] for r in out)


def test_phase_registry():
    reset_phases()
    with phase("x"):
        pass
    with phase("x"):
        pass
    rep = phase_report()
    assert rep["x"]["calls"] == 2 and rep["x"]["total_s"] >= 0


def test_convert_reference_pt_caches(tmp_path):
    """Reference .pt cache artifacts convert into our cache formats and are
    picked up by the cache-hit paths."""
    import torch
    from asvd4llm_tpu.tools.convert_cache import (
        convert_sensitivity, convert_stats,
    )
    from asvd4llm_tpu.utils.cache import ArtifactCache

    # reference-style sensitivity dict {name: {ratio: ppl}}
    sens = {"model.layers.0.self_attn.q_proj": {0.4: 12.5, 0.9: 10.1}}
    torch.save(sens, tmp_path / "sens.pt")
    convert_sensitivity(str(tmp_path / "sens.pt"), str(tmp_path), "k1")
    got = ArtifactCache(str(tmp_path)).load_sensitivity("k1")
    assert got["model.layers.0.self_attn.q_proj"][0.4] == 12.5

    # reference-style stats dict {name: tensor}
    stats = {"model.layers.0.self_attn.q_proj": torch.arange(4).float()}
    torch.save(stats, tmp_path / "stats.pt")
    convert_stats(str(tmp_path / "stats.pt"), str(tmp_path), "k1", "abs_mean")
    arrs = ArtifactCache(str(tmp_path)).load_arrays("calib_abs_mean", "k1")
    np.testing.assert_array_equal(arrs["model.layers.0.self_attn.q_proj"],
                                  [0, 1, 2, 3])


def test_kv_longbench_preset():
    cfgs = PRESETS["kv_cache_longbench"]("m")
    assert all(c.eval_tasks == "small_longbench" and c.compress_kv_cache
               for c in cfgs)
