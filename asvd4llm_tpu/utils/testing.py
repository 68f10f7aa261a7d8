"""Offline test/demo assets: build a complete local HF checkpoint (tiny
random model + a real BPE fast tokenizer trained on the synthetic corpus)
so the full CLI pipeline is drivable with zero network egress."""

from __future__ import annotations

import os


def build_tiny_checkpoint(path: str, family: str = "llama", *,
                          vocab_size: int = 512, hidden: int = 64,
                          layers: int = 2, heads: int = 4, seed: int = 0,
                          ) -> str:
    import torch
    import transformers
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    from asvd4llm_tpu.data.datasets import synthetic_text_corpus

    os.makedirs(path, exist_ok=True)

    # tokenizer: BPE trained on the synthetic corpus
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<unk>", "<s>", "</s>"])
    corpus = synthetic_text_corpus(400_000, seed=7)
    tok.train_from_iterator([corpus], trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>")
    fast.save_pretrained(path)
    real_vocab = fast.vocab_size

    torch.manual_seed(seed)
    if family == "llama":
        cfg = transformers.LlamaConfig(
            vocab_size=real_vocab, hidden_size=hidden,
            intermediate_size=hidden * 2, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=max(heads // 2, 1),
            max_position_embeddings=2048, tie_word_embeddings=False)
        model = transformers.LlamaForCausalLM(cfg)
    elif family == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=real_vocab, hidden_size=hidden, ffn_dim=hidden * 2,
            num_hidden_layers=layers, num_attention_heads=heads,
            max_position_embeddings=2048, word_embed_proj_dim=hidden)
        model = transformers.OPTForCausalLM(cfg)
    elif family == "gemma2":
        cfg = transformers.Gemma2Config(
            vocab_size=real_vocab, hidden_size=hidden,
            intermediate_size=hidden * 2, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=max(heads // 2, 1),
            head_dim=hidden // heads, max_position_embeddings=2048,
            sliding_window=64, query_pre_attn_scalar=hidden // heads,
            attn_implementation="eager")
        model = transformers.Gemma2ForCausalLM(cfg)
    else:
        raise ValueError(family)
    model.save_pretrained(path)
    return path
