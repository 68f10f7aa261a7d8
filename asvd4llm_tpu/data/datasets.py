"""Calibration / evaluation data loaders.

Semantics parity with ref datautils.py:

- calib (ref :106-160): nsamples random windows from the concatenated train
  text, snapped past the next sentence boundary ('.'), tokenized and
  truncated to seqlen; optional BOS prepend; alpaca chat-format path;
  cached under cache/.
- eval (ref :163-189): wikitext2 test / ptb validation / c4 validation as
  one concatenated tokenized string.

This environment has zero network egress, so the HF `datasets` paths are
attempted lazily and a deterministic synthetic corpus backs all tests and
offline runs ("synthetic" dataset name, or automatic fallback with a loud
warning when allow_synthetic_fallback=True).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

# The reference's llama_chat_format (ref datautils.py:84-89) double-braces
# the placeholders, so its `.format(instruction=..., response=...)` call
# ESCAPES them instead of substituting: every alpaca calib sample renders
# to the same literal "{ instruction } [/INST] { response }" string. That
# quirk is the reference's actual calibration input, so it is the default
# here (parity); fixed_alpaca_template=True substitutes for real.
_CHAT_FORMAT_REF = (
    "<s>[INST] <<SYS>>\n"
    '"Below is an instruction that describes a task. '
    'Write a response that appropriately completes the request."\n'
    "<</SYS>>\n\n{{ instruction }} [/INST] {{ response }} </s>\n"
)
_CHAT_FORMAT_FIXED = (
    "<s>[INST] <<SYS>>\n"
    '"Below is an instruction that describes a task. '
    'Write a response that appropriately completes the request."\n'
    "<</SYS>>\n\n{instruction} [/INST] {response} </s>\n"
)


def _load_hf_text(name: str, split: str) -> str:
    from datasets import load_dataset

    if name == "wikitext2":
        data = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        return "\n\n".join(data["text"])
    if name == "ptb":
        data = load_dataset("ptb_text_only", "penn_treebank", split=split)
        return "\n\n".join(data["sentence"])
    if name == "c4":
        files = {"train": "en/c4-train.00000-of-01024.json.gz",
                 "validation": "en/c4-validation.00000-of-00008.json.gz"}
        data = load_dataset("allenai/c4", data_files={split: files[split]},
                            split=split)
        return "\n\n".join(data["text"])
    raise NotImplementedError(name)


# --------------------------------------------------------------- synthetic

_WORDS = None


def _word_bank(n=4096, seed=1234):
    global _WORDS
    if _WORDS is None:
        rng = random.Random(seed)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        _WORDS = ["".join(rng.choice(alphabet)
                          for _ in range(rng.randint(2, 9)))
                  for _ in range(n)]
    return _WORDS


def synthetic_text_corpus(n_chars: int, seed: int = 0) -> str:
    """Deterministic Zipf-ish pseudo-text for offline operation."""
    words = _word_bank()
    rng = np.random.RandomState(seed)
    out = []
    total = 0
    while total < n_chars:
        sent_len = int(rng.randint(4, 20))
        idx = rng.zipf(1.3, size=sent_len) % len(words)
        sent = " ".join(words[i] for i in idx) + "."
        out.append(sent)
        total += len(sent) + 1
    return " ".join(out)


def synthetic_token_corpus(n_tokens: int, vocab_size: int, seed: int = 0,
                           ) -> np.ndarray:
    """Deterministic token stream (for tokenizer-less tiny-model tests):
    a mixture of Zipf-distributed unigrams and short repeated motifs so a
    random model still sees non-uniform channel activations."""
    rng = np.random.RandomState(seed)
    toks = rng.zipf(1.5, size=n_tokens).astype(np.int64) % vocab_size
    # overlay repeated motifs to create learnable/hot patterns
    motif = rng.randint(0, vocab_size, size=16)
    for start in range(0, n_tokens - 16, 256):
        toks[start:start + 16] = motif
    return toks


# ----------------------------------------------------------------- calib

def get_calib_data(name: str, tokenizer, model_id: str, nsamples: int,
                   seqlen: int = 2048, seed: int = 3, use_bos: bool = False,
                   cache_dir: str = "cache", use_cache: bool = True,
                   vocab_size: Optional[int] = None,
                   allow_synthetic_fallback: bool = False,
                   fixed_alpaca_template: bool = False) -> list[dict]:
    """Returns a list of {"input_ids": [1, L] np.int64, "attention_mask"} —
    the reference's loader contract (ref datautils.py:106-160)."""
    os.makedirs(cache_dir, exist_ok=True)
    fixed_tag = "_fixedtpl" if (name == "alpaca" and fixed_alpaca_template) \
        else ""
    cache_file = os.path.join(
        cache_dir,
        f"{name}_{model_id.replace('/', '_')}_{nsamples}_{seqlen}_{seed}"
        f"_bos{use_bos}{fixed_tag}.npz")
    if use_cache and os.path.exists(cache_file):
        z = np.load(cache_file)
        return [{"input_ids": z[f"ids_{i}"],
                 "attention_mask": np.ones_like(z[f"ids_{i}"])}
                for i in range(int(z["n"]))]

    rng = random.Random(seed)
    samples: list[np.ndarray] = []

    if name == "synthetic":
        assert vocab_size is not None, "synthetic calib needs vocab_size"
        corpus = synthetic_token_corpus(max(nsamples * seqlen * 2, 4 * seqlen),
                                        vocab_size, seed=seed)
        for _ in range(nsamples):
            i = rng.randint(0, len(corpus) - seqlen - 1)
            samples.append(corpus[i:i + seqlen][None, :])
    elif name == "alpaca":
        # chat-format path (ref datautils.py:126-139). Reference semantics
        # replicated exactly: sample nsamples rows from the FULL list and
        # only then keep the input=="" ones (so the result may hold fewer
        # than nsamples), and render the escaped-brace template (see
        # _CHAT_FORMAT_REF above).
        import json
        with open("data/alpaca_data.json") as f:
            data = json.load(f)
        fmt = _CHAT_FORMAT_FIXED if fixed_alpaca_template else _CHAT_FORMAT_REF
        for ex in rng.sample(data, nsamples):
            if ex.get("input", "") != "":
                continue
            s = fmt.format(instruction=ex["instruction"],
                           response=ex["output"])
            ids = np.asarray(tokenizer(s)["input_ids"])[None, :seqlen]
            samples.append(ids)
    else:
        try:
            tot_text = _load_hf_text(name, "train")
        except Exception as e:  # zero-egress fallback
            if not allow_synthetic_fallback:
                raise
            log.warning("dataset %s unavailable (%s); USING SYNTHETIC CORPUS",
                        name, e)
            tot_text = synthetic_text_corpus(4_000_000, seed=seed)
        for _ in range(nsamples):
            # random window snapped past next sentence end (ref :146-158)
            i = rng.randint(0, len(tot_text) - seqlen - 1)
            txt = tot_text[i:i + seqlen * 10]
            txt = txt[txt.find(".") + 1:].strip()
            if use_bos:
                txt = tokenizer.bos_token + txt
            ids = np.asarray(tokenizer(txt)["input_ids"])[None, :seqlen]
            samples.append(ids)

    np.savez(cache_file, n=len(samples),
             **{f"ids_{i}": s for i, s in enumerate(samples)})
    return [{"input_ids": s, "attention_mask": np.ones_like(s)}
            for s in samples]


# ------------------------------------------------------------------ eval

def get_eval_tokens(name: str, tokenizer, cache_dir: str = "cache",
                    use_cache: bool = True, vocab_size: Optional[int] = None,
                    allow_synthetic_fallback: bool = False,
                    synthetic_len: int = 64_000, seed: int = 0,
                    model_id: str = "") -> np.ndarray:
    """Concatenated eval token ids [1, N] (ref datautils.py:163-189;
    wikitext2 uses test split, ptb/c4 use validation).

    The cache key includes the tokenizer identity (model_id + vocab_size +
    whether the corpus is synthetic): two models sharing a cache_dir must
    never reuse each other's token ids (the reference keys its /tmp eval
    cache by model name, ref evaluate_utils.py:141-147)."""
    os.makedirs(cache_dir, exist_ok=True)

    synthetic = name == "synthetic"
    if not synthetic:
        split = "test" if name == "wikitext2" else "validation"
        try:
            text = _load_hf_text(name, split)
        except Exception as e:
            if not allow_synthetic_fallback:
                raise
            log.warning("eval dataset %s unavailable (%s); SYNTHETIC", name, e)
            synthetic = True
    if synthetic:
        assert vocab_size is not None, "synthetic eval needs vocab_size"

    tok_tag = model_id.replace("/", "_") if model_id else \
        getattr(tokenizer, "name_or_path", "").replace("/", "_")
    key = f"{tok_tag}_v{vocab_size}" + ("_synth" + str(seed) if synthetic else "")
    cache_file = os.path.join(cache_dir, f"eval_{name}_{key}_tokens.npy")
    if use_cache and os.path.exists(cache_file):
        return np.load(cache_file)

    if synthetic:
        toks = synthetic_token_corpus(synthetic_len, vocab_size, seed=seed)[None, :]
    else:
        toks = np.asarray(tokenizer(text)["input_ids"])[None, :]
    np.save(cache_file, toks)
    return toks
