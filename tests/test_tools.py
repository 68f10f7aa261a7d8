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


def test_serve_cli_batch_mode(tmp_path, capsys):
    """serve --batch drives the continuous-batching engine end to end from
    the CLI over an exported KV-compressed repo."""
    import transformers

    from asvd4llm_tpu.export.hf_repo import export_hf_repo
    from asvd4llm_tpu.models import params_from_torch_model
    from asvd4llm_tpu.models.registry import (
        get_linear, lowrank_leaf, set_linear,
    )
    from asvd4llm_tpu.ops.asvd import factorize_linear
    from asvd4llm_tpu.tools.serve import main
    from asvd4llm_tpu.utils.testing import build_tiny_checkpoint

    import jax.numpy as jnp
    import numpy as np
    import shutil
    import os

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    manifest = {}
    for i in range(2):
        for k in ("k_proj", "v_proj"):
            name = f"model.layers.{i}.self_attn.{k}"
            leaf = get_linear(params, spec, name)
            f = factorize_linear(leaf["w"], leaf["b"], 1.2, backend="exact")
            params = set_linear(params, spec, name,
                                lowrank_leaf(f.A, f.B, f.bias))
            manifest[name] = f.rank
    repo = str(tmp_path / "serve_repo")
    export_hf_repo(repo, params, spec, manifest, hf_config=cfg)
    tok_src = str(tmp_path / "tok")
    build_tiny_checkpoint(tok_src, "llama")
    for fname in os.listdir(tok_src):
        if "token" in fname or fname == "special_tokens_map.json":
            shutil.copy(os.path.join(tok_src, fname),
                        os.path.join(repo, fname))
    batch = tmp_path / "prompts.txt"
    batch.write_text("hello there\nthe quick brown\n")

    rc = main(["--model", repo, "--batch", str(batch),
               "--max_new_tokens", "5", "--latent_kv", "kv",
               "--dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("---") == 2  # one block per request


def test_cache_pack_roundtrip(tmp_path):
    """pack -> wipe -> restore reproduces the cache byte-for-byte; the
    size cap skips oversized programs; restore never overwrites."""
    from asvd4llm_tpu.tools import cache_pack

    src = tmp_path / "jax_cache"
    src.mkdir()
    (src / "jit_a-cache").write_bytes(b"x" * 100)
    (src / "jit_b-cache").write_bytes(b"y" * 5000)
    tar = tmp_path / "c.tar"
    n = cache_pack.pack(str(src), str(tar), max_bytes=1000)
    assert n == 1  # b skipped by the cap
    n = cache_pack.pack(str(src), str(tar))
    assert n == 2

    dst = tmp_path / "fresh"
    assert cache_pack.restore(str(dst), str(tar)) == 2
    assert (dst / "jit_a-cache").read_bytes() == b"x" * 100
    assert (dst / "jit_b-cache").read_bytes() == b"y" * 5000
    # idempotent: nothing overwritten on second restore
    assert cache_pack.restore(str(dst), str(tar)) == 0
    rows = cache_pack.inventory(str(src))
    assert rows[0][0] == 5000


def test_cache_pack_roundtrip(tmp_path):
    """pack -> wipe -> restore reproduces the cache byte-for-byte; the
    size cap skips oversized programs; restore never overwrites."""
    from asvd4llm_tpu.tools import cache_pack

    src = tmp_path / "jax_cache"
    src.mkdir()
    (src / "jit_a-cache").write_bytes(b"x" * 100)
    (src / "jit_b-cache").write_bytes(b"y" * 5000)
    tar = tmp_path / "c.tar"
    n = cache_pack.pack(str(src), str(tar), max_bytes=1000)
    assert n == 1  # b skipped by the cap
    n = cache_pack.pack(str(src), str(tar))
    assert n == 2

    dst = tmp_path / "fresh"
    assert cache_pack.restore(str(dst), str(tar)) == 2
    assert (dst / "jit_a-cache").read_bytes() == b"x" * 100
    assert (dst / "jit_b-cache").read_bytes() == b"y" * 5000
    # idempotent: nothing overwritten on second restore
    assert cache_pack.restore(str(dst), str(tar)) == 0
    rows = cache_pack.inventory(str(src))
    assert rows[0][0] == 5000
