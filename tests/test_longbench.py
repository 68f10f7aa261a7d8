"""LongBench harness tests: metric parity cases, middle truncation, prompt
construction, and an injected-examples end-to-end run on a tiny model."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from asvd4llm_tpu.eval.longbench import (
    FULL_DATASETS, MAX_GEN, PROMPTS, SMALL_DATASETS, build_prompt,
    classification_score, code_sim_score, count_score, eval_longbench,
    middle_truncate, qa_f1_score, retrieval_score, rouge_l_score,
    score_prediction, scorer,
)


def test_dataset_tables_consistent():
    assert set(PROMPTS) == set(MAX_GEN)
    assert len(FULL_DATASETS) == 21
    assert SMALL_DATASETS == ["qasper", "2wikimqa", "multi_news", "lcc"]


def test_qa_f1():
    assert qa_f1_score("the cat sat", "cat sat") == pytest.approx(1.0)
    assert qa_f1_score("Paris", "paris") == 1.0
    assert qa_f1_score("dog", "cat") == 0.0
    # partial overlap
    s = qa_f1_score("red blue", "blue green")
    assert 0 < s < 1


def test_rouge_l():
    assert rouge_l_score("a b c d", "a b c d") == 1.0
    assert rouge_l_score("a x b y c", "a b c") > 0.5
    assert rouge_l_score("", "a") == 0.0


def test_retrieval_and_count():
    assert retrieval_score("The answer is Paragraph 7", "Paragraph 7") == 1.0
    assert retrieval_score("Paragraph 3", "Paragraph 7") == 0.0
    assert count_score("there are 12 unique", "12") == 1.0
    assert count_score("maybe 5", "12") == 0.0


def test_classification():
    classes = ["location", "entity", "description"]
    assert classification_score("location", "location", classes) == 1.0
    assert classification_score("entity or description", "entity", classes) == 0.5
    assert classification_score("nothing", "entity", classes) == 0.0


def test_code_sim():
    assert code_sim_score("\nreturn x + 1\n", "return x + 1") == 1.0
    assert code_sim_score("pass", "return x + 1") < 0.5


def test_score_prediction_max_over_golds():
    s = score_prediction("hotpotqa", "blue", ["red", "blue"])
    assert s == 1.0


def test_middle_truncate():
    ids = list(range(100))
    out = middle_truncate(ids, 10)
    assert len(out) == 10
    assert out[:5] == [0, 1, 2, 3, 4] and out[-5:] == [95, 96, 97, 98, 99]
    assert middle_truncate(ids, 200) == ids


def test_build_prompt():
    p = build_prompt("qasper", {"context": "CTX", "input": "Q?"})
    assert "CTX" in p and "Q?" in p and p.endswith("Answer:")


def test_eval_longbench_injected(tmp_path):
    torch = pytest.importorskip("torch")
    import transformers
    from asvd4llm_tpu.config import ASVDConfig
    from asvd4llm_tpu.models import params_from_torch_model

    cfg_t = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg_t).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)

    class Tok:
        eos_token_id = 0
        def encode(self, s):
            return [2 + (hash(w) % 120) for w in s.split()][:256]
        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    cfg = ASVDConfig(model_id="t", output_dir=str(tmp_path))
    examples = {"2wikimqa": [
        {"context": "p1 text here", "input": "who?", "answers": ["w5"]},
        {"context": "p2 text here", "input": "what?", "answers": ["w9 w12"]},
    ]}
    # cap generation cheaply
    MAX_GEN["2wikimqa"] = 4
    try:
        results = eval_longbench(params, spec, Tok(), cfg,
                                 datasets=["2wikimqa"],
                                 examples_by_dataset=examples,
                                 max_prompt_tokens=64)
    finally:
        MAX_GEN["2wikimqa"] = 32
    assert "longbench_2wikimqa" in results
    assert os.path.exists(tmp_path / "longbench_2wikimqa.jsonl")
    with open(tmp_path / "longbench_result.json") as f:
        assert "2wikimqa" in json.load(f)
    lines = open(tmp_path / "longbench_2wikimqa.jsonl").read().strip().split("\n")
    assert len(lines) == 2 and "pred" in json.loads(lines[0])
