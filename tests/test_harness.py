"""Task-harness tests: loglikelihood engine math vs direct forward, MC
selection semantics, task routing, and an end-to-end MMLU-format eval on a
tiny model with a real offline tokenizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.config import ASVDConfig  # noqa: E402
from asvd4llm_tpu.eval.harness import (  # noqa: E402
    LoglikelihoodEngine, MCDoc, MCTask, GreedyCompletionTask,
    MMLU_SUBJECTS, _mmlu_prompt, evaluate_tasks, expand_tasks,
)
from asvd4llm_tpu.models import forward, params_from_torch_model  # noqa: E402


class WordTok:
    """Deterministic toy tokenizer: word -> stable id in [2, 120)."""
    eos_token_id = 0

    def encode(self, s):
        return [2 + (hash(w) % 118) for w in s.replace("\n", " \n ").split(" ") if w]

    def decode(self, ids):
        return " ".join(f"t{i}" for i in ids)


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


def test_engine_ll_matches_manual(tiny):
    params, spec = tiny
    engine = LoglikelihoodEngine(params, spec, bucket=8, batch_size=2)
    ctx = [5, 6, 7]
    cont = [8, 9]
    (ll, greedy), = engine.score([(ctx, cont)])

    ids = jnp.asarray([ctx + cont])
    logits = np.asarray(forward(params, ids[:, :-1], spec))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    manual = logp[0, 2, 8] + logp[0, 3, 9]  # positions predicting cont tokens
    np.testing.assert_allclose(ll, manual, rtol=1e-4)
    manual_greedy = (np.argmax(logits[0, 2]) == 8) and (np.argmax(logits[0, 3]) == 9)
    assert greedy == manual_greedy


def test_engine_buckets_and_order(tiny):
    params, spec = tiny
    engine = LoglikelihoodEngine(params, spec, bucket=8, batch_size=2)
    pairs = [([1] * n, [2, 3]) for n in (20, 3, 11, 7, 15)]
    out = engine.score(pairs)
    assert len(out) == 5
    # results must be in input order: re-score one pair alone and compare
    (solo, _), = engine.score([pairs[2]])
    np.testing.assert_allclose(out[2][0], solo, rtol=1e-4)


def test_mc_task_selects_argmax(tiny):
    params, spec = tiny
    tok = WordTok()
    engine = LoglikelihoodEngine(params, spec, bucket=8, batch_size=4)
    docs = [MCDoc(query="the question is", choices=[" alpha", " beta", " gamma"],
                  gold=0)]
    task = MCTask("t", docs)
    r = task.evaluate(engine, tok)
    assert set(r) == {"acc", "acc_norm"}
    # determinism
    assert task.evaluate(engine, tok) == r


def test_greedy_completion_task(tiny):
    params, spec = tiny
    tok = WordTok()
    task = GreedyCompletionTask("lam", [("some context here", " target")])
    engine = LoglikelihoodEngine(params, spec, bucket=8, batch_size=2)
    r = task.evaluate(engine, tok)
    assert 0.0 <= r["acc"] <= 1.0 and r["ppl"] > 0


def test_mmlu_prompt_format():
    q = {"question": "What is 2+2?", "choices": ["3", "4", "5", "6"],
         "answer": 1}
    fs = {"question": "What is 1+1?", "choices": ["2", "3", "4", "5"],
          "answer": 0}
    doc = _mmlu_prompt("college_mathematics", q, [fs])
    assert doc.query.startswith("The following are multiple choice questions")
    assert "college mathematics" in doc.query
    assert "What is 1+1?" in doc.query and "Answer: A" in doc.query
    assert doc.query.endswith("Answer:")
    assert doc.choices == [" A", " B", " C", " D"]
    assert doc.gold == 1


def test_task_routing():
    assert len(expand_tasks("mmlu")) == 57
    assert expand_tasks("mmlu")[0] == "hendrycksTest-abstract_algebra"
    assert expand_tasks("llmqat") == ["lambada_openai", "openbookqa"]
    assert expand_tasks("a,b") == ["a", "b"]
    assert len(MMLU_SUBJECTS) == 57


def test_evaluate_tasks_with_injected_objects(tiny):
    params, spec = tiny
    cfg = ASVDConfig(model_id="t", seqlen=128)
    docs = [MCDoc(query=f"q{i} is", choices=[" x", " y"], gold=i % 2)
            for i in range(4)]
    results = evaluate_tasks(params, spec, WordTok(), "custom", cfg,
                             task_objects=[MCTask("custom", docs)])
    assert "custom" in results and "mean" in results
    assert results["mean"] == results["custom"]["acc"]
