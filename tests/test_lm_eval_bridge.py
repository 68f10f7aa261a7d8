"""Arbitrary-task routing through the lm-eval bridge (the reference routes
any unknown task name to lm_eval.evaluator.simple_evaluate,
ref evaluate_utils.py:209-221). lm_eval isn't installed here, so these
tests inject a faithful stub that drives the adapter's loglikelihood /
generate_until protocol and verify the scores against the native engine."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.config import ASVDConfig  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return params, spec


class CharTok:
    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % 128 for c in s] or [1]

    def decode(self, ids):
        return "".join(chr(int(i) % 128) for i in ids)


def _install_stub(monkeypatch, record):
    """Fake lm_eval 0.4-style package whose simple_evaluate drives the
    adapter protocol like the real evaluator would."""
    lm_eval = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    api_model = types.ModuleType("lm_eval.api.model")

    class LM:
        def __init__(self):
            pass

    api_model.LM = LM
    evaluator = types.ModuleType("lm_eval.evaluator")

    class Instance:
        def __init__(self, args):
            self.args = args

    def simple_evaluate(model=None, tasks=(), **kw):
        lls = model.loglikelihood([Instance(("Question: is water wet?",
                                             " yes")),
                                   Instance(("Question: is water wet?",
                                             " no"))])
        gen = model.generate_until([Instance(("Once upon",
                                              {"until": ["."],
                                               "max_gen_toks": 4}))])
        roll = model.loglikelihood_rolling([Instance(("hello world",))])
        record.update(lls=lls, gen=gen, roll=roll)
        return {"results": {t: {"acc": 0.5} for t in tasks}}

    evaluator.simple_evaluate = simple_evaluate
    lm_eval.api = api
    lm_eval.evaluator = evaluator
    for name, mod in (("lm_eval", lm_eval), ("lm_eval.api", api),
                      ("lm_eval.api.model", api_model),
                      ("lm_eval.evaluator", evaluator)):
        monkeypatch.setitem(sys.modules, name, mod)


def test_foreign_task_routes_through_lm_eval(tiny, monkeypatch):
    from asvd4llm_tpu.eval.harness import evaluate_tasks

    params, spec = tiny
    record = {}
    _install_stub(monkeypatch, record)
    cfg = ASVDConfig(model_id="t", seqlen=64)
    res = evaluate_tasks(params, spec, CharTok(), "some_exotic_task", cfg)
    assert res["some_exotic_task"] == {"acc": 0.5}
    assert res["mean"] == 0.5
    # the stub exercised the full protocol
    assert len(record["lls"]) == 2
    for ll, greedy in record["lls"]:
        assert np.isfinite(ll) and isinstance(greedy, bool)
    assert isinstance(record["gen"][0], str)
    assert np.isfinite(record["roll"][0])


def test_adapter_ll_matches_native_engine(tiny, monkeypatch):
    """The bridge's loglikelihood must equal the native engine's score for
    the same (ctx, cont) pair."""
    from asvd4llm_tpu.eval.harness import LoglikelihoodEngine
    from asvd4llm_tpu.eval.lm_eval_bridge import build_lm

    params, spec = tiny
    record = {}
    _install_stub(monkeypatch, record)
    cfg = ASVDConfig(model_id="t", seqlen=64)
    tok = CharTok()
    lm = build_lm(params, spec, tok, cfg)
    ctx, cont = "abc def", " ghi"
    (ll_bridge, _), = lm.loglikelihood([(ctx, cont)])

    engine = LoglikelihoodEngine(params, spec, max_len=64)
    ctx_ids = tok.encode(ctx)
    cont_ids = tok.encode(ctx + cont)[len(ctx_ids):]
    (ll_native, _), = engine.score([(ctx_ids, cont_ids)])
    assert ll_bridge == pytest.approx(ll_native, rel=1e-6)


def test_unknown_task_without_lm_eval_raises(tiny, monkeypatch):
    from asvd4llm_tpu.eval.harness import evaluate_tasks

    params, spec = tiny
    for name in list(sys.modules):
        if name.startswith("lm_eval"):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setitem(sys.modules, "lm_eval", None)  # force import fail
    cfg = ASVDConfig(model_id="t", seqlen=64)
    with pytest.raises(NotImplementedError):
        evaluate_tasks(params, spec, CharTok(), "some_exotic_task", cfg)
