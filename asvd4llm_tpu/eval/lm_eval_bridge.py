"""lm-eval bridge: route ARBITRARY task names to `lm_eval` when installed.

The reference forwards any unrecognized task name to
``lm_eval.evaluator.simple_evaluate`` through its EvalLM adapter
(ref evaluate_utils.py:14-87, :209-221). Our harness implements the
loglikelihood protocol natively (eval/harness.py); this module exposes
that engine through the lm-eval model API so ANY lm-eval task runs when
the package is present — restoring the reference's open-ended task
routing without vendoring the evaluator.

Version tolerance: lm-eval 0.3 passes request tuples and expects a BaseLM
subclass; 0.4+ passes Instance objects (``.args``) to an
``lm_eval.api.model.LM`` subclass. The adapter methods below accept both
shapes, and ``evaluate_via_lm_eval`` builds whichever base class the
installed version provides.

Deviation kept from the harness: logits use the TRUE vocab size, not the
reference's hardcoded ``[:, :, :50257]`` OPT-ism (ref evaluate_utils.py:84).
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)


def lm_eval_available() -> bool:
    try:
        import lm_eval
        import lm_eval.evaluator
        # guard against stub modules (tools/differential.py injects one to
        # import the reference tree)
        return hasattr(lm_eval.evaluator, "simple_evaluate")
    except Exception:
        return False


def _req_args(req):
    """Request -> argument tuple, tolerating 0.3 tuples / 0.4 Instances."""
    if hasattr(req, "args"):
        return req.args
    return req


class _AdapterCore:
    """lm-eval model protocol implemented over our jitted engines."""

    def __init__(self, params, spec, tokenizer, cfg):
        from asvd4llm_tpu.eval.harness import LoglikelihoodEngine

        self.params = params
        self.spec = spec
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.engine = LoglikelihoodEngine(params, spec, max_len=cfg.seqlen)

    # -- tokenization helpers (lm-eval 0.3 BaseLM surface) ------------------
    def tok_encode(self, string: str):
        return self.tokenizer.encode(string)

    def tok_decode(self, tokens):
        return self.tokenizer.decode(tokens)

    @property
    def eot_token_id(self):
        return getattr(self.tokenizer, "eos_token_id", 0) or 0

    @property
    def max_length(self):
        return self.cfg.seqlen

    @property
    def max_gen_toks(self):
        return 256

    @property
    def batch_size(self):
        return 8

    @property
    def device(self):
        return "tpu"

    # -- protocol ------------------------------------------------------------
    def loglikelihood(self, requests):
        pairs = []
        for req in requests:
            ctx, cont = _req_args(req)[:2]
            ctx_ids = self.tok_encode(ctx) if ctx else [self.eot_token_id]
            whole = self.tok_encode(ctx + cont) if ctx else \
                self.tok_encode(cont)
            cont_ids = whole[len(ctx_ids):] if ctx else whole
            if not cont_ids:
                cont_ids = self.tok_encode(cont)
            pairs.append((ctx_ids, cont_ids))
        return self.engine.score(pairs)

    def loglikelihood_rolling(self, requests):
        out = []
        for req in requests:
            (text,) = _req_args(req)[:1]
            ids = self.tok_encode(text)
            ll, _ = self.engine.score([([self.eot_token_id], ids)])[0]
            out.append(ll)
        return out

    def generate_until(self, requests):
        from asvd4llm_tpu.eval.generate import generate

        outs = []
        for req in requests:
            args = _req_args(req)
            ctx = args[0]
            until = []
            max_gen = self.max_gen_toks
            if len(args) > 1:
                opts = args[1]
                if isinstance(opts, dict):
                    until = opts.get("until") or []
                    max_gen = opts.get("max_gen_toks", max_gen)
                elif isinstance(opts, (list, tuple)):
                    until = list(opts)
                elif isinstance(opts, str):
                    until = [opts]
            ids = np.asarray(self.tok_encode(ctx))[None, -self.max_length:]
            out = generate(self.params, self.spec, ids,
                           max_new_tokens=max_gen,
                           eos_token_id=self.eot_token_id)
            text = self.tok_decode(list(out[0, ids.shape[1]:]))
            for stop in until:
                text = text.split(stop)[0]
            outs.append(text)
        return outs

    greedy_until = generate_until  # lm-eval 0.3 name


def build_lm(params, spec, tokenizer, cfg):
    """Instantiate the adapter as a subclass of the installed lm-eval's
    model base class (0.4 api.model.LM, else 0.3 base.BaseLM, else bare)."""
    core = _AdapterCore(params, spec, tokenizer, cfg)
    base = None
    try:
        from lm_eval.api.model import LM as base  # 0.4+
    except Exception:
        try:
            from lm_eval.base import BaseLM as base  # 0.3
        except Exception:
            base = None
    if base is None:
        return core

    class ASVDEvalLM(base):  # type: ignore[misc, valid-type]
        def __init__(self):
            try:
                super().__init__()
            except Exception:
                pass

        def __getattr__(self, name):
            return getattr(core, name)

        # explicit protocol methods (some versions check the class dict)
        def loglikelihood(self, requests):
            return core.loglikelihood(requests)

        def loglikelihood_rolling(self, requests):
            return core.loglikelihood_rolling(requests)

        def generate_until(self, requests):
            return core.generate_until(requests)

        def greedy_until(self, requests):
            return core.generate_until(requests)

        # 0.3 BaseLM abstract surface
        def tok_encode(self, s):
            return core.tok_encode(s)

        def tok_decode(self, t):
            return core.tok_decode(t)

        def _model_call(self, inps):
            raise NotImplementedError  # protocol methods above are used

        def _model_generate(self, *a, **k):
            raise NotImplementedError

        @property
        def eot_token_id(self):
            return core.eot_token_id

        @property
        def max_length(self):
            return core.max_length

        @property
        def max_gen_toks(self):
            return core.max_gen_toks

        @property
        def batch_size(self):
            return core.batch_size

        @property
        def device(self):
            return core.device

    return ASVDEvalLM()


def evaluate_via_lm_eval(params, spec, tokenizer, task_names: list[str],
                         cfg, num_fewshot: int = 0, limit=None) -> dict:
    """Run arbitrary lm-eval tasks through the installed evaluator
    (ref evaluate_utils.py:209-218) and flatten per-task metric dicts."""
    import lm_eval

    lm = build_lm(params, spec, tokenizer, cfg)
    kwargs = dict(model=lm, tasks=task_names)
    if limit not in (None, -1):
        kwargs["limit"] = limit
    if num_fewshot:
        kwargs["num_fewshot"] = num_fewshot
    res = lm_eval.evaluator.simple_evaluate(**kwargs)
    results = res["results"] if isinstance(res, dict) else res
    log.info("lm_eval results: %s", results)
    return {name: dict(metrics) for name, metrics in results.items()}
