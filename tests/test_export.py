"""Export round-trip tests: Orbax+manifest native checkpoint, and the
HF trust_remote_code repo loaded back through transformers itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.eval.ppl import evaluate_perplexity  # noqa: E402
from asvd4llm_tpu.export.checkpoint import load_compressed, save_compressed  # noqa: E402
from asvd4llm_tpu.export.hf_repo import export_hf_repo  # noqa: E402
from asvd4llm_tpu.models import forward, params_from_torch_model  # noqa: E402
from asvd4llm_tpu.models.registry import (  # noqa: E402
    get_linear, is_lowrank, lowrank_leaf, set_linear,
)
from asvd4llm_tpu.ops.asvd import factorize_linear  # noqa: E402


@pytest.fixture(scope="module")
def compressed():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    manifest = {}
    for name in ("model.layers.0.mlp.gate_proj",
                 "model.layers.1.self_attn.q_proj"):
        leaf = get_linear(params, spec, name)
        f = factorize_linear(leaf["w"], leaf["b"], 0.6, backend="exact")
        params = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))
        manifest[name] = f.rank
    return model.config, params, spec, manifest


def test_orbax_roundtrip(compressed, tmp_path):
    _, params, spec, manifest = compressed
    path = str(tmp_path / "ckpt")
    save_compressed(path, params, spec, manifest)
    p2, spec2, ranks2 = load_compressed(path, dtype=jnp.float32)
    assert spec2 == spec
    assert ranks2 == manifest

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, size=(2, 12)))
    np.testing.assert_allclose(np.asarray(forward(p2, ids, spec2)),
                               np.asarray(forward(params, ids, spec)),
                               atol=1e-5)
    # PPL identical through the restored model
    data = np.random.RandomState(1).randint(0, 128, size=(2, 16))
    assert evaluate_perplexity(p2, spec2, data) == pytest.approx(
        evaluate_perplexity(params, spec, data), rel=1e-5)


def test_hf_repo_roundtrip_through_transformers(compressed, tmp_path):
    """The exported repo must load with stock transformers trust_remote_code
    and reproduce our logits — the reference's deployment contract
    (ref README.md:15-24)."""
    hf_config, params, spec, manifest = compressed
    repo = str(tmp_path / "repo")
    export_hf_repo(repo, params, spec, manifest, hf_config=hf_config)

    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    # factored layers present with right shapes
    mods = dict(loaded.named_modules())
    gp = mods["model.layers.0.mlp.gate_proj"]
    assert hasattr(gp, "ALinear") and hasattr(gp, "BLinear")
    assert gp.BLinear.weight.shape == (manifest["model.layers.0.mlp.gate_proj"], 32)

    ids = np.random.RandomState(2).randint(0, 128, size=(1, 10))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_load_factored_hf_repo_back_into_pytree(compressed, tmp_path):
    """An ASVD-compressed HF repo (ALinear/BLinear state dict naming) loads
    back into our params with low-rank leaves intact — interop with both
    our exports and reference-produced checkpoints."""
    import jax.numpy as jnp
    from asvd4llm_tpu.models.loader import load_model_native
    from asvd4llm_tpu.models.registry import is_lowrank, get_linear

    hf_config, params, spec, manifest = compressed
    repo = str(tmp_path / "repo2")
    export_hf_repo(repo, params, spec, manifest, hf_config=hf_config)

    p2, spec2 = load_model_native(repo, dtype=jnp.float32)
    for name in manifest:
        assert is_lowrank(get_linear(p2, spec2, name)), name
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 128, size=(1, 9)))
    np.testing.assert_allclose(np.asarray(forward(p2, ids, spec2)),
                               np.asarray(forward(params, ids, spec)),
                               atol=1e-5)


def test_orbax_roundtrip_quantized_leaves(compressed, tmp_path):
    """A q4-deployed model round-trips through the NATIVE Orbax+manifest
    checkpoint (v2 manifest records per-leaf encodings, not just ranks)."""
    from asvd4llm_tpu.models.registry import is_q4_lowrank
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int4

    _, params, spec, manifest = compressed
    q4 = quantize_lowrank_factors_int4(params, spec)
    path = str(tmp_path / "q4ckpt")
    save_compressed(path, q4, spec, manifest)
    p2, spec2, ranks2 = load_compressed(path, dtype=jnp.float32)
    assert ranks2 == manifest
    for name in manifest:
        assert is_q4_lowrank(get_linear(p2, spec2, name)), name

    ids = jnp.asarray(np.random.RandomState(4).randint(0, 128, size=(2, 9)))
    np.testing.assert_allclose(np.asarray(forward(p2, ids, spec2)),
                               np.asarray(forward(q4, ids, spec)),
                               atol=1e-5)


def test_int4_export_roundtrip(compressed, tmp_path):
    """Packed-int4 HF export (the reference ships AWQ w4 via external CUDA
    kernels, ref quantization.py:269; here the repo itself stores 4-bit
    codes): config carries asvd_int4, the generated ASVDQ4Linear loads and
    reproduces our q4 forward, and the repo loads back into q4 leaves."""
    import json

    from asvd4llm_tpu.models.loader import load_model_native
    from asvd4llm_tpu.models.registry import is_q4_lowrank
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int4

    hf_config, params, spec, manifest = compressed
    q4 = quantize_lowrank_factors_int4(params, spec)
    repo = str(tmp_path / "int4_repo")
    export_hf_repo(repo, q4, spec, manifest, hf_config=hf_config)

    with open(f"{repo}/config.json") as f:
        cj = json.load(f)
    assert set(cj["asvd_int4"]["layers"]) == set(manifest)
    assert cj["asvd_int4"]["group"] == 128

    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    mods = dict(loaded.named_modules())
    gp = mods["model.layers.0.mlp.gate_proj"]
    assert gp.A_qweight.dtype == torch.uint8  # real 4-bit storage
    assert gp.B_qweight.dtype == torch.uint8

    ids = np.random.RandomState(2).randint(0, 128, size=(1, 10))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(q4, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    # native (torch-free) load back into our pytree: q4 leaves intact,
    # identical logits through the fused-q4 dispatch path
    p2, spec2 = load_model_native(repo, dtype=jnp.float32)
    for name in manifest:
        assert is_q4_lowrank(get_linear(p2, spec2, name)), name
    np.testing.assert_allclose(
        np.asarray(forward(p2, jnp.asarray(ids), spec2)), ours, atol=1e-5)


def test_int8_export_roundtrip(compressed, tmp_path):
    """Int8-factor HF export: config carries asvd_int8, the generated
    ASVDQ8Linear reproduces our q8 forward, and the repo loads back into
    q8 leaves for the fused q8 serving path."""
    import json

    from asvd4llm_tpu.models.loader import load_model_native
    from asvd4llm_tpu.models.registry import is_q8_lowrank
    from asvd4llm_tpu.ops.quant_apply import quantize_lowrank_factors_int8

    hf_config, params, spec, manifest = compressed
    q8 = quantize_lowrank_factors_int8(params, spec)
    repo = str(tmp_path / "int8_repo")
    export_hf_repo(repo, q8, spec, manifest, hf_config=hf_config)

    with open(f"{repo}/config.json") as f:
        cj = json.load(f)
    assert set(cj["asvd_int8"]["layers"]) == set(manifest)

    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    gp = dict(loaded.named_modules())["model.layers.0.mlp.gate_proj"]
    assert gp.A_qweight.dtype == torch.int8

    ids = np.random.RandomState(4).randint(0, 128, size=(1, 10))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(q8, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    p2, spec2 = load_model_native(repo, dtype=jnp.float32)
    for name in manifest:
        assert is_q8_lowrank(get_linear(p2, spec2, name)), name
    np.testing.assert_allclose(
        np.asarray(forward(p2, jnp.asarray(ids), spec2)), ours, atol=1e-5)


def test_opt350m_style_export_roundtrip(tmp_path):
    """OPT with word_embed_proj_dim != hidden (project_in/out): export must
    keep the narrow embedding dim (round-1 bug hardcoded hidden_size) and
    load back through stock transformers with matching logits; a compressed
    lm_head travels through truncation_ranks."""
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=64,
        word_embed_proj_dim=24, do_layer_norm_before=False,
        tie_word_embeddings=False)
    torch.manual_seed(5)
    model = transformers.OPTForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    manifest = {}
    for name in ("model.decoder.layers.0.fc1", "lm_head"):
        leaf = get_linear(params, spec, name)
        f = factorize_linear(leaf["w"], leaf["b"], 0.6, backend="exact")
        params = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))
        manifest[name] = f.rank

    repo = str(tmp_path / "opt_repo")
    export_hf_repo(repo, params, spec, manifest, hf_config=model.config)

    import json
    with open(f"{repo}/config.json") as f:
        cj = json.load(f)
    assert cj["word_embed_proj_dim"] == 24
    assert cj["truncation_ranks"]["lm_head"] == manifest["lm_head"]

    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    mods = dict(loaded.named_modules())
    assert hasattr(mods["lm_head"], "ALinear")
    assert hasattr(mods["model.decoder.layers.0.fc1"], "ALinear")

    ids = np.random.RandomState(6).randint(2, 128, size=(1, 8))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_qwen2_export_roundtrip(tmp_path):
    """qwen2 (GQA + q/k/v biases) must export with Qwen2 classes — the
    internal spec.family is "llama", but a Llama skeleton has no q/k/v
    bias params and would reject the state dict. Factoring q_proj also
    checks the bias rides ALinear through export."""
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=96, tie_word_embeddings=False)
    torch.manual_seed(11)
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    manifest = {}
    for name in ("model.layers.0.self_attn.q_proj",
                 "model.layers.1.mlp.down_proj"):
        leaf = get_linear(params, spec, name)
        f = factorize_linear(leaf["w"], leaf["b"], 0.6, backend="exact")
        params = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))
        manifest[name] = f.rank

    repo = str(tmp_path / "qwen2_repo")
    export_hf_repo(repo, params, spec, manifest, hf_config=model.config)
    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    mods = dict(loaded.named_modules())
    qp = mods["model.layers.0.self_attn.q_proj"]
    assert hasattr(qp, "ALinear") and qp.ALinear.bias is not None
    # undecomposed k_proj keeps its qwen2 bias
    assert mods["model.layers.0.self_attn.k_proj"].bias is not None

    ids = np.random.RandomState(12).randint(0, 128, size=(1, 9))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_gemma_export_roundtrip(tmp_path):
    """gemma-1 was missing from _FAMILY_CLASSES in round 1 (export
    KeyErrored); now exports and loads back through transformers."""
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64)
    torch.manual_seed(7)
    model = transformers.GemmaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    name = "model.layers.0.mlp.up_proj"
    leaf = get_linear(params, spec, name)
    f = factorize_linear(leaf["w"], leaf["b"], 0.6, backend="exact")
    params = set_linear(params, spec, name, lowrank_leaf(f.A, f.B, f.bias))

    repo = str(tmp_path / "gemma_repo")
    export_hf_repo(repo, params, spec, {name: f.rank}, hf_config=model.config)
    loaded = transformers.AutoModelForCausalLM.from_pretrained(
        repo, trust_remote_code=True).eval()
    assert hasattr(dict(loaded.named_modules())[name], "ALinear")

    ids = np.random.RandomState(8).randint(0, 128, size=(1, 8))
    with torch.no_grad():
        ref = loaded(torch.from_numpy(ids.copy())).logits.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), spec))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=2e-3)
