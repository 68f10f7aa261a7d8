"""Calibration tests: stats accumulation semantics, Fisher gradients vs a
torch autograd oracle, cache round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.calib.fisher import calib_fisher_info  # noqa: E402
from asvd4llm_tpu.calib.stats import calib_input_distribution  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402
from asvd4llm_tpu.utils.cache import ArtifactCache  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return model, params, spec


def _loader(n, vocab=128, L=24, seed=0):
    rng = np.random.RandomState(seed)
    return [{"input_ids": rng.randint(0, vocab, size=(1, L)),
             "attention_mask": np.ones((1, L), np.int64)} for _ in range(n)]


def test_abs_mean_accumulates_across_batches(tiny):
    model, params, spec = tiny
    loader = _loader(3)
    stats = calib_input_distribution(params, spec, loader, "abs_mean")
    one = calib_input_distribution(params, spec, loader[:1], "abs_mean")
    k = sorted(stats)[0]
    # sum semantics (ref act_aware_utils.py:67): 3 batches ≈ 3x one batch scale
    assert float(stats[k].sum()) > float(one[k].sum()) * 1.5


def test_abs_max_is_max_not_sum(tiny):
    model, params, spec = tiny
    loader = _loader(3)
    stats3 = calib_input_distribution(params, spec, loader, "abs_max")
    stats1 = calib_input_distribution(params, spec, loader[:1], "abs_max")
    for k in stats3:
        assert bool((stats3[k] >= stats1[k] - 1e-6).all())


def test_fisher_matches_torch_autograd(tiny):
    """Fisher = sqrt(mean over batches of grad²-rowmean) with the CORRECT
    single-shift next-token loss (documented deviation from the
    reference's double shift)."""
    model, params, spec = tiny
    loader = _loader(2, L=16, seed=1)

    # torch oracle with single-shift loss
    import torch.nn as nn
    fisher_t = {}
    for batch in loader:
        ids = torch.from_numpy(batch["input_ids"])
        inputs, labels = ids[:, :-1], ids[:, 1:]
        model.zero_grad()
        logits = model(input_ids=inputs).logits
        loss = nn.CrossEntropyLoss()(logits.reshape(-1, logits.size(-1)),
                                     labels.reshape(-1))
        loss.backward()
        for name, mod in model.named_modules():
            # every nn.Linear incl. lm_head, like the reference's walk
            if isinstance(mod, nn.Linear):
                g = mod.weight.grad.detach()
                fisher_t[name] = fisher_t.get(name, 0) + g.pow(2).mean(0)
    fisher_t = {k: (v / len(loader)).sqrt() for k, v in fisher_t.items()}
    model.zero_grad()

    fisher_j = calib_fisher_info(params, spec, loader)
    assert set(fisher_j) == set(fisher_t)
    for k in fisher_t:
        np.testing.assert_allclose(np.asarray(fisher_j[k]),
                                   fisher_t[k].numpy(), atol=1e-6, rtol=2e-3)


def test_stats_cache_roundtrip(tiny, tmp_path):
    model, params, spec = tiny
    loader = _loader(2)
    cache = ArtifactCache(str(tmp_path))
    s1 = calib_input_distribution(params, spec, loader, "abs_mean",
                                  cache=cache, cache_key="k1")
    s2 = calib_input_distribution(params, spec, [], "abs_mean",
                                  cache=cache, cache_key="k1")  # hit: loader unused
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]))
