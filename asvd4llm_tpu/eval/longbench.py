"""LongBench evaluation harness — native re-implementation of the
capability the reference vendors from THUDM/LongBench
(ref tools/eval_longbench.py): 21 datasets with per-dataset prompt
templates and generation budgets, middle-truncation of long prompts,
greedy decoding, per-dataset metric dispatch, per-prediction JSONL and a
score JSON under output/ (ref :356-364,441-443).

Metrics are implemented here with no external metric deps (the reference
pulls rouge/fuzzywuzzy; we use pure-python LCS rouge-L and difflib
similarity; Chinese segmentation uses jieba when importable, else
character-level). small subset = qasper/2wikimqa/multi_news/lcc
(ref :393-398).

Prompt templates and gen lengths follow the published LongBench
configuration (they define the benchmark).
"""

from __future__ import annotations

import difflib
import json
import logging
import os
import re
import string
from collections import Counter

import numpy as np

log = logging.getLogger(__name__)

PROMPTS = {
    "narrativeqa": "You are given a story, which can be either a novel or a movie script, and a question. Answer the question as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nStory: {context}\n\nNow, answer the question based on the story as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:",
    "qasper": "You are given a scientific article and a question. Answer the question as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nArticle: {context}\n\n Answer the question based on the above article as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:",
    "multifieldqa_en": "Read the following text and answer briefly.\n\n{context}\n\nNow, answer the following question based on the above text, only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "multifieldqa_zh": "阅读以下文字并用中文简短回答：\n\n{context}\n\n现在请基于上面的文章回答下面的问题，只告诉我答案，不要输出任何其他字词。\n\n问题：{input}\n回答：",
    "hotpotqa": "Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "2wikimqa": "Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "musique": "Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:",
    "dureader": "请基于给定的文章回答下述问题。\n\n文章：{context}\n\n请基于上述文章回答下面的问题。\n\n问题：{input}\n回答：",
    "gov_report": "You are given a report by a government agency. Write a one-page summary of the report.\n\nReport:\n{context}\n\nNow, write a one-page summary of the report.\n\nSummary:",
    "qmsum": "You are given a meeting transcript and a query containing a question or instruction. Answer the query in one or more sentences.\n\nTranscript:\n{context}\n\nNow, answer the query based on the above meeting transcript in one or more sentences.\n\nQuery: {input}\nAnswer:",
    "multi_news": "You are given several news passages. Write a one-page summary of all news. \n\nNews:\n{context}\n\nNow, write a one-page summary of all the news.\n\nSummary:",
    "vcsum": "下面有一段会议记录，请你阅读后，写一段总结，总结会议的内容。\n会议记录：\n{context}\n\n会议总结：",
    "trec": "Please determine the type of the question below. Here are some examples of questions.\n\n{context}\n{input}",
    "triviaqa": "Answer the question based on the given passage. Only give me the answer and do not output any other words. The following are some examples.\n\n{context}\n\n{input}",
    "samsum": "Summarize the dialogue into a few short sentences. The following are some examples.\n\n{context}\n\n{input}",
    "lsht": "请判断给定新闻的类别，下面是一些例子。\n\n{context}\n{input}",
    "passage_count": "There are some paragraphs below sourced from Wikipedia. Some of them may be duplicates. Please carefully read these paragraphs and determine how many unique paragraphs there are after removing duplicates. In other words, how many non-repeating paragraphs are there in total?\n\n{context}\n\nPlease enter the final count of unique paragraphs after removing duplicates. The output format should only contain the number, such as 1, 2, 3, and so on.\n\nThe final answer is: ",
    "passage_retrieval_en": "Here are 30 paragraphs from Wikipedia, along with an abstract. Please determine which paragraph the abstract is from.\n\n{context}\n\nThe following is an abstract.\n\n{input}\n\nPlease enter the number of the paragraph that the abstract is from. The answer format must be like \"Paragraph 1\", \"Paragraph 2\", etc.\n\nThe answer is: ",
    "passage_retrieval_zh": "以下是若干段落文字，以及其中一个段落的摘要。请确定给定的摘要出自哪一段。\n\n{context}\n\n下面是一个摘要\n\n{input}\n\n请输入摘要所属段落的编号。答案格式必须是\"段落1\"，\"段落2\"等格式\n\n答案是：",
    "lcc": "Please complete the code given below. \n{context}Next line of code:\n",
    "repobench-p": "Please complete the code given below. \n{context}{input}Next line of code:\n",
}

MAX_GEN = {
    "narrativeqa": 128, "qasper": 128, "multifieldqa_en": 64,
    "multifieldqa_zh": 64, "hotpotqa": 32, "2wikimqa": 32, "musique": 32,
    "dureader": 128, "gov_report": 512, "qmsum": 512, "multi_news": 512,
    "vcsum": 512, "trec": 64, "triviaqa": 32, "samsum": 128, "lsht": 64,
    "passage_count": 32, "passage_retrieval_en": 32,
    "passage_retrieval_zh": 32, "lcc": 64, "repobench-p": 64,
}

FULL_DATASETS = list(MAX_GEN)
SMALL_DATASETS = ["qasper", "2wikimqa", "multi_news", "lcc"]  # ref :393-398


# ---------------------------------------------------------------- metrics

def _normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def _tokens(s: str, zh: bool = False) -> list[str]:
    if zh:
        try:
            import jieba
            return [t for t in jieba.cut(s) if t.strip()]
        except Exception:
            return list(s.replace(" ", ""))
    return _normalize(s).split()


def qa_f1_score(pred: str, gold: str, zh: bool = False) -> float:
    p, g = _tokens(pred, zh), _tokens(gold, zh)
    if not p or not g:
        return float(p == g)
    common = Counter(p) & Counter(g)
    overlap = sum(common.values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(p)
    recall = overlap / len(g)
    return 2 * precision * recall / (precision + recall)


def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l_score(pred: str, gold: str, zh: bool = False) -> float:
    p, g = _tokens(pred, zh), _tokens(gold, zh)
    if not p or not g:
        return 0.0
    lcs = _lcs_len(p, g)
    if lcs == 0:
        return 0.0
    prec, rec = lcs / len(p), lcs / len(g)
    return 2 * prec * rec / (prec + rec)


def classification_score(pred: str, gold: str, all_classes=None) -> float:
    """Gold class must appear in the prediction; ties broken against longer
    spurious class mentions (LongBench convention)."""
    em_match_list = []
    for cls in (all_classes or [gold]):
        if cls and cls in pred:
            em_match_list.append(cls)
    for match in list(em_match_list):
        if match != gold and gold in match:
            em_match_list.remove(match)
    return float(gold in em_match_list) / max(len(em_match_list), 1) \
        if em_match_list else 0.0


def retrieval_score(pred: str, gold: str, zh: bool = False) -> float:
    pattern = r"段落(\d+)" if zh else r"Paragraph (\d+)"
    gold_m = re.findall(pattern, gold)
    gold_num = gold_m[0] if gold_m else gold
    found = re.findall(r"\d+", pred)
    return float(bool(found) and found[0] == str(gold_num))


def count_score(pred: str, gold: str) -> float:
    nums = re.findall(r"\d+", pred)
    return float(bool(nums) and nums[0] == str(gold).strip())


def code_sim_score(pred: str, gold: str) -> float:
    pred_lines = [l for l in pred.lstrip("\n").split("\n") if l.strip()]
    first = pred_lines[0] if pred_lines else ""
    return difflib.SequenceMatcher(None, first, gold).ratio()


METRICS = {
    "narrativeqa": qa_f1_score, "qasper": qa_f1_score,
    "multifieldqa_en": qa_f1_score, "hotpotqa": qa_f1_score,
    "2wikimqa": qa_f1_score, "musique": qa_f1_score,
    "triviaqa": qa_f1_score,
    "multifieldqa_zh": lambda p, g, **kw: qa_f1_score(p, g, zh=True),
    "dureader": lambda p, g, **kw: rouge_l_score(p, g, zh=True),
    "vcsum": lambda p, g, **kw: rouge_l_score(p, g, zh=True),
    "gov_report": rouge_l_score, "qmsum": rouge_l_score,
    "multi_news": rouge_l_score, "samsum": rouge_l_score,
    "trec": classification_score, "lsht": classification_score,
    "passage_count": count_score,
    "passage_retrieval_en": retrieval_score,
    "passage_retrieval_zh": lambda p, g, **kw: retrieval_score(p, g, zh=True),
    "lcc": code_sim_score, "repobench-p": code_sim_score,
}


def score_prediction(dataset: str, pred: str, golds: list[str],
                     all_classes=None) -> float:
    """Max over reference answers (LongBench convention); rouge exceptions
    scored as 0 like the reference (ref :124-127)."""
    metric = METRICS[dataset]
    best = 0.0
    for g in golds:
        try:
            if dataset in ("trec", "lsht"):
                s = metric(pred, g, all_classes=all_classes)
            else:
                s = metric(pred, g)
        except Exception:
            s = 0.0
        best = max(best, s)
    return best


# ------------------------------------------------------------- harness ---

def middle_truncate(ids: list[int], budget: int) -> list[int]:
    """Keep head and tail halves when over budget (ref :317-322)."""
    if len(ids) <= budget:
        return ids
    half = budget // 2
    return list(ids[:half]) + list(ids[len(ids) - (budget - half):])


def build_prompt(dataset: str, example: dict) -> str:
    return PROMPTS[dataset].format(**{
        "context": example.get("context", ""),
        "input": example.get("input", ""),
    })


def get_pred(params, spec, tokenizer, dataset: str, examples, *,
             max_prompt_tokens: int = 1024, latent_kv: bool = False,
             max_examples: int = -1) -> list[dict]:
    """Greedy predictions for one dataset (ref :312-353)."""
    from asvd4llm_tpu.eval.generate import generate_auto
    preds = []
    for i, ex in enumerate(examples):
        if max_examples > 0 and i >= max_examples:
            break
        prompt = build_prompt(dataset, ex)
        ids = tokenizer.encode(prompt)
        ids = middle_truncate(ids, max_prompt_tokens)
        arr = np.asarray(ids, np.int32)[None, :]
        out = generate_auto(params, spec, arr,
                            max_new_tokens=MAX_GEN[dataset],
                            eos_token_id=tokenizer.eos_token_id,
                            latent_kv=latent_kv)
        gen = out[0, len(ids):]
        text = tokenizer.decode([t for t in gen.tolist()
                                 if t != tokenizer.eos_token_id])
        preds.append({
            "pred": text,
            "answers": ex.get("answers", []),
            "all_classes": ex.get("all_classes"),
            "length": ex.get("length"),
        })
    return preds


def scorer(dataset: str, preds: list[dict]) -> float:
    if not preds:
        return 0.0
    total = sum(score_prediction(dataset, p["pred"], p["answers"],
                                 p.get("all_classes")) for p in preds)
    return round(100 * total / len(preds), 2)


def eval_longbench(params, spec, tokenizer, cfg, *, small: bool = False,
                   datasets=None, examples_by_dataset=None,
                   max_prompt_tokens: int = 1024, latent_kv: bool = False,
                   max_examples: int = -1) -> dict:
    """Full harness: load (or accept injected) examples, predict, score,
    write per-pred JSONL + score JSON under output/ (ref :356-364,441-443)."""
    names = datasets or (SMALL_DATASETS if small else FULL_DATASETS)
    os.makedirs(cfg.output_dir, exist_ok=True)
    results = {}
    for name in names:
        if examples_by_dataset is not None:
            examples = examples_by_dataset.get(name, [])
        else:
            from datasets import load_dataset
            examples = load_dataset("THUDM/LongBench", name, split="test")
        preds = get_pred(params, spec, tokenizer, name, examples,
                         max_prompt_tokens=max_prompt_tokens,
                         latent_kv=latent_kv, max_examples=max_examples)
        with open(os.path.join(cfg.output_dir, f"longbench_{name}.jsonl"),
                  "w") as f:
            for p in preds:
                f.write(json.dumps(p, ensure_ascii=False) + "\n")
        results[name] = scorer(name, preds)
        log.info("longbench %s: %.2f", name, results[name])
    with open(os.path.join(cfg.output_dir, "longbench_result.json"), "w") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    return {f"longbench_{k}": v for k, v in results.items()}
