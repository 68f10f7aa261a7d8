"""PPL evaluator parity vs torch oracle loops re-deriving the reference
formulas (ref evaluate_utils.py:90-115 and :140-191)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from asvd4llm_tpu.eval.ppl import evaluate_perplexity, evaluate_ppl_windowed  # noqa: E402
from asvd4llm_tpu.models import params_from_torch_model  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval()
    params, spec = params_from_torch_model(model, dtype=jnp.float32)
    return model, params, spec


def torch_ref_evaluate_perplexity(model, dataset, limit):
    """Literal re-derivation of ref evaluate_utils.py:90-115."""
    nsamples, seqlen = dataset.shape
    nlls = []
    for i in range(nsamples):
        if i == limit:
            break
        input_ids = torch.from_numpy(dataset[i:i + 1, :-1])
        labels = torch.from_numpy(dataset[i:i + 1, 1:])
        with torch.no_grad():
            logits = model(input_ids=input_ids).logits
        loss = torch.nn.CrossEntropyLoss()(
            logits.view(-1, logits.size(-1)), labels.reshape(-1))
        nlls.append(loss.float() * seqlen)
    return float(torch.exp(torch.stack(nlls).sum() / (len(nlls) * seqlen)))


def test_evaluate_perplexity_parity(tiny):
    model, params, spec = tiny
    rng = np.random.RandomState(0)
    data = rng.randint(0, 128, size=(5, 33))
    ref = torch_ref_evaluate_perplexity(model, data, limit=-1)
    ours = evaluate_perplexity(params, spec, data)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_evaluate_perplexity_limit(tiny):
    model, params, spec = tiny
    rng = np.random.RandomState(1)
    data = rng.randint(0, 128, size=(6, 17))
    ref = torch_ref_evaluate_perplexity(model, data, limit=3)
    ours = evaluate_perplexity(params, spec, data, limit=3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def torch_ref_windowed(model, testenc, seqlen, use_bos=False, bos_id=1):
    """Literal re-derivation of ref evaluate_utils.py:149-188."""
    if use_bos:
        seqlen = seqlen - 1
    nsamples = testenc.size // seqlen
    nlls = []
    for i in range(nsamples):
        batch = torch.from_numpy(testenc[:, i * seqlen:(i + 1) * seqlen])
        if use_bos:
            bos = torch.full((batch.size(0), 1), bos_id, dtype=batch.dtype)
            batch = torch.cat([bos, batch], dim=1)
        with torch.no_grad():
            hidden = model.model(batch)[0]
            if use_bos:
                hidden = hidden[:, 1:, :]
            logits = model.lm_head(hidden)
        shift_logits = logits[:, :-1, :]
        shift_labels = torch.from_numpy(
            testenc[:, i * seqlen:(i + 1) * seqlen])[:, 1:]
        loss = torch.nn.CrossEntropyLoss()(
            shift_logits.reshape(-1, shift_logits.size(-1)),
            shift_labels.reshape(-1))
        nlls.append(loss.float() * seqlen)
    return float(torch.exp(torch.stack(nlls).sum() / (len(nlls) * seqlen)))


def test_windowed_ppl_parity(tiny):
    model, params, spec = tiny
    rng = np.random.RandomState(2)
    stream = rng.randint(0, 128, size=(1, 700))
    ref = torch_ref_windowed(model, stream, seqlen=128)
    ours = evaluate_ppl_windowed(params, spec, stream, seqlen=128)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_windowed_ppl_use_bos(tiny):
    model, params, spec = tiny
    rng = np.random.RandomState(3)
    stream = rng.randint(0, 128, size=(1, 600))
    ref = torch_ref_windowed(model, stream, seqlen=128, use_bos=True, bos_id=1)
    ours = evaluate_ppl_windowed(params, spec, stream, seqlen=128,
                                 use_bos=True, bos_token_id=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
