"""Data loader tests: synthetic corpus determinism, calib window contract,
sentence snapping, BOS, eval tokens, cache round-trip."""

import numpy as np
import pytest

from asvd4llm_tpu.data.datasets import (
    get_calib_data, get_eval_tokens, synthetic_text_corpus,
    synthetic_token_corpus,
)


class CharTok:
    bos_token = "<s>"

    def __call__(self, s):
        ids = [1] + [2 + (ord(c) % 100) for c in s if not c.isspace()] \
            if s.startswith(self.bos_token) else \
            [2 + (ord(c) % 100) for c in s if not c.isspace()]
        return {"input_ids": ids}


def test_synthetic_corpora_deterministic():
    a = synthetic_text_corpus(10_000, seed=3)
    b = synthetic_text_corpus(10_000, seed=3)
    c = synthetic_text_corpus(10_000, seed=4)
    assert a == b and a != c
    t1 = synthetic_token_corpus(1000, 128, seed=1)
    t2 = synthetic_token_corpus(1000, 128, seed=1)
    np.testing.assert_array_equal(t1, t2)
    assert t1.max() < 128 and t1.min() >= 0


def test_calib_synthetic_contract(tmp_path):
    loader = get_calib_data("synthetic", None, "m", 4, seqlen=32, seed=5,
                            cache_dir=str(tmp_path), vocab_size=64)
    assert len(loader) == 4
    for b in loader:
        assert b["input_ids"].shape == (1, 32)
        assert b["attention_mask"].shape == (1, 32)
        assert b["input_ids"].max() < 64


def test_calib_cache_roundtrip(tmp_path):
    l1 = get_calib_data("synthetic", None, "m", 3, seqlen=16, seed=7,
                        cache_dir=str(tmp_path), vocab_size=32)
    l2 = get_calib_data("synthetic", None, "m", 3, seqlen=16, seed=7,
                        cache_dir=str(tmp_path), vocab_size=32)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])


def test_text_fallback_sentence_snap(tmp_path):
    """Offline HF dataset -> synthetic text fallback, windows snapped past
    a sentence end (ref datautils.py:146-158)."""
    loader = get_calib_data("wikitext2", CharTok(), "m", 3, seqlen=64,
                            seed=1, cache_dir=str(tmp_path),
                            allow_synthetic_fallback=True)
    assert len(loader) == 3
    for b in loader:
        assert b["input_ids"].shape[1] <= 64


def test_calib_offline_without_fallback_raises(tmp_path):
    with pytest.raises(Exception):
        get_calib_data("wikitext2", CharTok(), "m", 2, seqlen=32,
                       cache_dir=str(tmp_path), use_cache=False,
                       allow_synthetic_fallback=False)


def test_eval_tokens_synthetic(tmp_path):
    toks = get_eval_tokens("synthetic", None, cache_dir=str(tmp_path),
                           vocab_size=50, synthetic_len=1000)
    assert toks.shape == (1, 1000)
    again = get_eval_tokens("synthetic", None, cache_dir=str(tmp_path),
                            vocab_size=50, synthetic_len=1000)
    np.testing.assert_array_equal(toks, again)


def test_eval_tokens_cache_keyed_by_model(tmp_path):
    """Two models sharing a cache_dir must not reuse each other's eval
    token ids (round-1 advisor finding: the cache file was keyed by
    dataset name only)."""
    a = get_eval_tokens("synthetic", None, cache_dir=str(tmp_path),
                        vocab_size=50, synthetic_len=500, model_id="org/modelA")
    b = get_eval_tokens("synthetic", None, cache_dir=str(tmp_path),
                        vocab_size=128, synthetic_len=500, model_id="org/modelB")
    assert a.max() < 50  # modelA's cache was not served to modelB and vice versa
    assert b.max() >= 50 or b.max() < 50 and not np.array_equal(a, b)
    # same identity hits the cache
    a2 = get_eval_tokens("synthetic", None, cache_dir=str(tmp_path),
                         vocab_size=50, synthetic_len=500, model_id="org/modelA")
    np.testing.assert_array_equal(a, a2)
