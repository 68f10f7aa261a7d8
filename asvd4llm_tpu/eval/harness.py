"""Task evaluation harness — the native replacement for the reference's
lm-eval 0.3.0 adapter (ref evaluate_utils.py:14-87, :204-226).

Implements the loglikelihood protocol directly (jitted, length-bucketed)
instead of wrapping an external evaluator:

- ``loglikelihood(ctx_ids, cont_ids)``: sum of continuation log-probs under
  teacher forcing + whether the continuation is the greedy decode;
- multiple-choice tasks score every (context, choice) pair and report
  ``acc`` (argmax raw ll) and ``acc_norm`` (length-normalized), matching
  lm-eval semantics;
- task routing matches the reference: "mmlu" expands to the 57
  hendrycksTest subjects (ref evaluate_utils.py:204-205), "llmqat" to
  lambada_openai + openbookqa (ref :206-208), and the mean-acc summary row
  is appended (ref :219-224).

Deviation: the reference's adapter slices logits to the first 50257 vocab
entries — an OPT-ism that corrupts other vocabularies
(ref evaluate_utils.py:84; SURVEY §7.3) — we use the true vocab size.

Zero-egress note: dataset loading tries HF `datasets`; tests drive the
harness with in-memory docs.
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.decoder import apply_lm_head, forward_hidden

log = logging.getLogger(__name__)

MMLU_SUBJECTS = [
    "abstract_algebra", "anatomy", "astronomy", "business_ethics",
    "clinical_knowledge", "college_biology", "college_chemistry",
    "college_computer_science", "college_mathematics", "college_medicine",
    "college_physics", "computer_security", "conceptual_physics",
    "econometrics", "electrical_engineering", "elementary_mathematics",
    "formal_logic", "global_facts", "high_school_biology",
    "high_school_chemistry", "high_school_computer_science",
    "high_school_european_history", "high_school_geography",
    "high_school_government_and_politics", "high_school_macroeconomics",
    "high_school_mathematics", "high_school_microeconomics",
    "high_school_physics", "high_school_psychology",
    "high_school_statistics", "high_school_us_history",
    "high_school_world_history", "human_aging", "human_sexuality",
    "international_law", "jurisprudence", "logical_fallacies",
    "machine_learning", "management", "marketing", "medical_genetics",
    "miscellaneous", "moral_disputes", "moral_scenarios", "nutrition",
    "philosophy", "prehistory", "professional_accounting",
    "professional_law", "professional_medicine", "professional_psychology",
    "public_relations", "security_studies", "sociology",
    "us_foreign_policy", "virology", "world_religions",
]


# ------------------------------------------------------------ ll engine --

@functools.partial(jax.jit, static_argnames=("spec",))
def _ll_batch(params, spec, ids, cont_mask):
    """ids: [B, L] context+continuation; cont_mask: [B, L] 1.0 where the
    token is part of the continuation. Returns (sum logprob, greedy_ok)."""
    inputs = ids[:, :-1]
    targets = ids[:, 1:]
    mask = cont_mask[:, 1:]
    hidden, _ = forward_hidden(params, inputs, spec)
    logits = apply_lm_head(params, spec, hidden)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ll = (tok_lp * mask).sum(axis=-1)
    greedy = (jnp.argmax(logits, axis=-1) == targets) | (mask == 0)
    return ll, greedy.all(axis=-1)


class LoglikelihoodEngine:
    """Batches (context, continuation) id pairs into padded length buckets
    and scores them with the jitted teacher-forcing pass."""

    def __init__(self, params, spec, *, bucket: int = 64,
                 max_len: int = 2048, batch_size: int = 8):
        self.params = params
        self.spec = spec
        self.bucket = bucket
        self.max_len = max_len
        self.batch_size = batch_size

    def _pad_len(self, n: int) -> int:
        return min(self.max_len, -(-n // self.bucket) * self.bucket)

    def score(self, pairs: list[tuple[list[int], list[int]]]
              ) -> list[tuple[float, bool]]:
        """pairs: [(ctx_ids, cont_ids)] -> [(ll, greedy_match)]."""
        order = sorted(range(len(pairs)),
                       key=lambda i: len(pairs[i][0]) + len(pairs[i][1]))
        results: dict[int, tuple[float, bool]] = {}
        i = 0
        while i < len(order):
            chunk = order[i:i + self.batch_size]
            L = self._pad_len(max(len(pairs[j][0]) + len(pairs[j][1])
                                  for j in chunk))
            ids = np.zeros((len(chunk), L), np.int32)
            cmask = np.zeros((len(chunk), L), np.float32)
            for row, j in enumerate(chunk):
                ctx, cont = pairs[j]
                seq = (list(ctx) + list(cont))[-L:]
                n_cont = min(len(cont), L)
                ids[row, :len(seq)] = seq
                cmask[row, len(seq) - n_cont:len(seq)] = 1.0
            ll, greedy = _ll_batch(self.params, self.spec,
                                   jnp.asarray(ids), jnp.asarray(cmask))
            for row, j in enumerate(chunk):
                results[j] = (float(ll[row]), bool(greedy[row]))
            i += self.batch_size
        return [results[j] for j in range(len(pairs))]


# ---------------------------------------------------------------- tasks --

@dataclass
class MCDoc:
    """One multiple-choice item: query + candidate continuations."""
    query: str
    choices: list[str]
    gold: int


@dataclass
class MCTask:
    name: str
    docs: list[MCDoc]

    def evaluate(self, engine: LoglikelihoodEngine, tokenizer,
                 limit: int = -1) -> dict:
        docs = self.docs if limit in (-1, None) else self.docs[:limit]
        pairs, spans = [], []
        for d in docs:
            start = len(pairs)
            ctx_ids = tokenizer.encode(d.query)
            for c in d.choices:
                # lm-eval convention: continuation tokenized in context via
                # whole-string encode minus context prefix
                whole = tokenizer.encode(d.query + c)
                cont = whole[len(ctx_ids):] or tokenizer.encode(c)
                pairs.append((ctx_ids, cont))
            spans.append((start, len(pairs), d))
        scored = engine.score(pairs)
        correct = correct_norm = 0
        for start, end, d in spans:
            lls = [scored[k][0] for k in range(start, end)]
            lens = [max(len(pairs[k][1]), 1) for k in range(start, end)]
            if int(np.argmax(lls)) == d.gold:
                correct += 1
            if int(np.argmax([l / n for l, n in zip(lls, lens)])) == d.gold:
                correct_norm += 1
        n = max(len(docs), 1)
        return {"acc": correct / n, "acc_norm": correct_norm / n}


@dataclass
class PartialMCDoc:
    """Partial-evaluation item (lm-eval 0.3.0 winogrande): per-choice
    CONTEXTS (the blank filled with each option) share one continuation
    (the text after the blank) — only the continuation is scored."""
    contexts: list[str]
    continuation: str
    gold: int


@dataclass
class PartialMCTask:
    name: str
    docs: list[PartialMCDoc]

    def evaluate(self, engine: LoglikelihoodEngine, tokenizer,
                 limit: int = -1) -> dict:
        docs = self.docs if limit in (-1, None) else self.docs[:limit]
        pairs, spans = [], []
        for d in docs:
            start = len(pairs)
            for ctx in d.contexts:
                ctx_ids = tokenizer.encode(ctx)
                whole = tokenizer.encode(ctx + d.continuation)
                cont = whole[len(ctx_ids):] or \
                    tokenizer.encode(d.continuation)
                pairs.append((ctx_ids, cont))
            spans.append((start, len(pairs), d))
        scored = engine.score(pairs)
        correct = 0
        for start, end, d in spans:
            lls = [scored[k][0] for k in range(start, end)]
            if int(np.argmax(lls)) == d.gold:
                correct += 1
        return {"acc": correct / max(len(docs), 1)}


@dataclass
class GreedyCompletionTask:
    """lambada-style: predict the final word greedily; acc = exact match;
    ppl = exp(-mean continuation ll) — NOT length-normalized, matching
    lm-eval 0.3.0's perplexity aggregation for lambada."""
    name: str
    docs: list[tuple[str, str]]  # (context, target continuation)

    def evaluate(self, engine: LoglikelihoodEngine, tokenizer,
                 limit: int = -1) -> dict:
        docs = self.docs if limit in (-1, None) else self.docs[:limit]
        pairs = []
        for ctx, target in docs:
            ctx_ids = tokenizer.encode(ctx)
            whole = tokenizer.encode(ctx + target)
            cont = whole[len(ctx_ids):] or tokenizer.encode(target)
            pairs.append((ctx_ids, cont))
        scored = engine.score(pairs)
        n = max(len(docs), 1)
        acc = sum(1 for _, greedy in scored if greedy) / n
        ppl = float(np.exp(-np.mean([ll for ll, _ in scored])))
        return {"acc": acc, "ppl": ppl}


# ---------------------------------------------------- dataset construction

def _mmlu_prompt(subject: str, q: dict, fewshot: list[dict]) -> MCDoc:
    """hendrycksTest prompt format (lm-eval 0.3.0 layout)."""
    letters = ["A", "B", "C", "D"]
    header = (f"The following are multiple choice questions (with answers) "
              f"about {subject.replace('_', ' ')}.\n\n")

    def fmt(item, with_answer):
        s = item["question"] + "\n"
        for l, c in zip(letters, item["choices"]):
            s += f"{l}. {c}\n"
        s += "Answer:"
        if with_answer:
            s += f" {letters[item['answer']]}\n\n"
        return s

    ctx = header + "".join(fmt(f, True) for f in fewshot) + fmt(q, False)
    return MCDoc(query=ctx, choices=[f" {l}" for l in letters],
                 gold=int(q["answer"]))


def load_mmlu_task(subject: str, num_fewshot: int = 0) -> MCTask:
    from datasets import load_dataset
    ds = load_dataset("cais/mmlu", subject)
    fewshot = list(ds["dev"])[:num_fewshot] if num_fewshot else []
    docs = [_mmlu_prompt(subject, q, fewshot) for q in ds["test"]]
    return MCTask(name=f"hendrycksTest-{subject}", docs=docs)


# Per-task doc builders: pure row->doc functions (testable offline with
# fixture rows) pinned to lm-eval 0.3.0's doc_to_text / choice / gold
# semantics — golden-example tests in tests/test_harness.py assert the
# exact strings.

def build_lambada_docs(rows) -> list[tuple[str, str]]:
    """lm-eval 0.3.0 lambada: ctx = text minus last word, target =
    ' ' + last word (rsplit on the final space)."""
    docs = []
    for ex in rows:
        ctx, last = ex["text"].rsplit(" ", 1)
        docs.append((ctx, " " + last))
    return docs


def build_openbookqa_docs(rows) -> list[MCDoc]:
    return [MCDoc(query=ex["question_stem"],
                  choices=[" " + t for t in ex["choices"]["text"]],
                  gold=ex["choices"]["label"].index(ex["answerKey"]))
            for ex in rows]


def build_piqa_docs(rows) -> list[MCDoc]:
    return [MCDoc(query=f"Question: {ex['goal']}\nAnswer:",
                  choices=[" " + ex["sol1"], " " + ex["sol2"]],
                  gold=int(ex["label"])) for ex in rows]


def build_boolq_docs(rows) -> list[MCDoc]:
    return [MCDoc(query=f"{ex['passage']}\nQuestion: {ex['question']}?\nAnswer:",
                  choices=[" no", " yes"], gold=int(ex["answer"]))
            for ex in rows]


def build_arc_docs(rows) -> list[MCDoc]:
    # lm-eval 0.3.0 maps numeric answerKeys to letters; indexing the raw
    # label list is equivalent (labels carry the same symbols as the key)
    return [MCDoc(query=f"Question: {ex['question']}\nAnswer:",
                  choices=[" " + t for t in ex["choices"]["text"]],
                  gold=ex["choices"]["label"].index(ex["answerKey"]))
            for ex in rows]


def build_winogrande_docs(rows) -> list[PartialMCDoc]:
    """lm-eval 0.3.0 winogrande PARTIAL EVALUATION: per option, context =
    sentence up to the blank with the option substituted; the SHARED
    continuation ' ' + text-after-blank (stripped) is what gets scored."""
    docs = []
    for ex in rows:
        loc = ex["sentence"].index("_")
        prefix = ex["sentence"][:loc]
        continuation = " " + ex["sentence"][loc + 1:].strip()
        docs.append(PartialMCDoc(
            contexts=[prefix + ex["option1"], prefix + ex["option2"]],
            continuation=continuation,
            gold=int(ex["answer"]) - 1))
    return docs


def _hellaswag_preprocess(text: str) -> str:
    """lm-eval 0.3.0 hellaswag text cleanup."""
    import re

    text = text.strip()
    text = text.replace(" [title]", ". ")
    text = re.sub(r"\[.*?\]", "", text)
    text = text.replace("  ", " ")
    return text


def build_hellaswag_docs(rows) -> list[MCDoc]:
    """lm-eval 0.3.0: query = preprocess(activity_label + ': ' + ctx_a +
    ' ' + ctx_b.capitalize()); choices preprocessed too."""
    docs = []
    for ex in rows:
        ctx = ex["ctx_a"] + " " + ex["ctx_b"].capitalize() \
            if "ctx_a" in ex else ex["ctx"]
        query = _hellaswag_preprocess(ex.get("activity_label", "") + ": "
                                      + ctx)
        docs.append(MCDoc(
            query=query,
            choices=[" " + _hellaswag_preprocess(e) for e in ex["endings"]],
            gold=int(ex["label"])))
    return docs


def build_sciq_docs(rows) -> list[MCDoc]:
    return [MCDoc(
        query="{}\nQuestion: {}\nAnswer:".format(
            ex.get("support", ""), ex["question"]).strip(),
        choices=[" " + c for c in (ex["distractor1"], ex["distractor2"],
                                   ex["distractor3"],
                                   ex["correct_answer"])],
        gold=3) for ex in rows]


def build_copa_docs(rows) -> list[MCDoc]:
    docs = []
    for ex in rows:
        conn = "because" if ex["question"] == "cause" else "therefore"
        # lm-eval 0.3.0 drops the final character unconditionally
        ctx = ex["premise"].strip()[:-1] + f" {conn}"
        docs.append(MCDoc(
            query=ctx,
            choices=[" " + ex["choice1"][0].lower() + ex["choice1"][1:],
                     " " + ex["choice2"][0].lower() + ex["choice2"][1:]],
            gold=int(ex["label"])))
    return docs


def build_rte_docs(rows) -> list[MCDoc]:
    return [MCDoc(
        query=f"{ex['premise']}\nQuestion: {ex['hypothesis']} True or False?\nAnswer:",
        choices=[" True", " False"], gold=int(ex["label"]))
        for ex in rows]


def load_task(name: str, num_fewshot: int = 0):
    if name.startswith("hendrycksTest-"):
        return load_mmlu_task(name.split("-", 1)[1], num_fewshot)
    from datasets import load_dataset
    if name == "lambada_openai":
        rows = load_dataset("EleutherAI/lambada_openai", "en")["test"]
        return GreedyCompletionTask(name=name, docs=build_lambada_docs(rows))
    if name == "openbookqa":
        rows = load_dataset("allenai/openbookqa", "main")["test"]
        return MCTask(name=name, docs=build_openbookqa_docs(rows))
    if name == "piqa":
        rows = load_dataset("piqa")["validation"]
        return MCTask(name=name, docs=build_piqa_docs(rows))
    if name == "boolq":
        rows = load_dataset("google/boolq")["validation"]
        return MCTask(name=name, docs=build_boolq_docs(rows))
    if name in ("arc_easy", "arc_challenge"):
        sub = "ARC-Easy" if name == "arc_easy" else "ARC-Challenge"
        rows = load_dataset("allenai/ai2_arc", sub)["test"]
        return MCTask(name=name, docs=build_arc_docs(rows))
    if name == "winogrande":
        rows = load_dataset("allenai/winogrande",
                            "winogrande_xl")["validation"]
        return PartialMCTask(name=name, docs=build_winogrande_docs(rows))
    if name == "hellaswag":
        rows = load_dataset("Rowan/hellaswag")["validation"]
        return MCTask(name=name, docs=build_hellaswag_docs(rows))
    if name == "sciq":
        rows = load_dataset("allenai/sciq")["test"]
        return MCTask(name=name, docs=build_sciq_docs(rows))
    if name == "copa":
        rows = load_dataset("super_glue", "copa")["validation"]
        return MCTask(name=name, docs=build_copa_docs(rows))
    if name == "rte":
        rows = load_dataset("super_glue", "rte")["validation"]
        return MCTask(name=name, docs=build_rte_docs(rows))
    raise NotImplementedError(f"task {name!r}")


# --------------------------------------------------------------- routing --

def expand_tasks(tasks: str) -> list[str]:
    """Reference task routing (ref evaluate_utils.py:204-208)."""
    if tasks == "mmlu":
        return [f"hendrycksTest-{s}" for s in MMLU_SUBJECTS]
    if tasks == "llmqat":
        return ["lambada_openai", "openbookqa"]
    return [t for t in tasks.split(",") if t]


def evaluate_tasks(params, spec, tokenizer, tasks: str, cfg,
                   num_fewshot: int = 0, limit: int = -1,
                   task_objects: Optional[list] = None,
                   longbench_examples: Optional[dict] = None) -> dict:
    """Evaluate named tasks (or pre-built task objects); appends the
    mean-acc summary like the reference (ref evaluate_utils.py:219-224).
    longbench_examples: optional {dataset: examples} injection for offline
    smoke runs."""
    if tasks in ("longbench", "small_longbench"):
        from asvd4llm_tpu.eval.longbench import eval_longbench
        # KV-compressed models generate against the realized latent cache
        return eval_longbench(params, spec, tokenizer, cfg,
                              small=(tasks == "small_longbench"),
                              latent_kv=cfg.compress_kv_cache,
                              examples_by_dataset=longbench_examples)

    engine = LoglikelihoodEngine(params, spec, max_len=cfg.seqlen)
    results: dict = {}
    if task_objects is not None:
        objs = task_objects
    else:
        objs, foreign = [], []
        for n in expand_tasks(tasks):
            try:
                objs.append(load_task(n, num_fewshot))
            except NotImplementedError:
                foreign.append(n)
        if foreign:
            # reference behavior: any unrecognized task name goes to the
            # installed lm-eval evaluator (ref evaluate_utils.py:209-221)
            from asvd4llm_tpu.eval.lm_eval_bridge import (
                evaluate_via_lm_eval, lm_eval_available,
            )
            if not lm_eval_available():
                raise NotImplementedError(
                    f"tasks {foreign} are not built in and the lm_eval "
                    f"package is not installed to route them")
            results.update(evaluate_via_lm_eval(
                params, spec, tokenizer, foreign, cfg,
                num_fewshot=num_fewshot, limit=limit))
    for task in objs:
        r = task.evaluate(engine, tokenizer, limit=limit)
        log.info("%s: %s", task.name, r)
        results[task.name] = r
    accs = [v["acc"] for v in results.values() if "acc" in v]
    if accs:
        results["mean"] = sum(accs) / len(accs)
    return results
