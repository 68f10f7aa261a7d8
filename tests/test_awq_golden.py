"""AWQ golden tests (VERDICT r3 #7): pin ops/awq.py against an
INDEPENDENT torch reimplementation of AWQ's activation-weighted objective
and against hand-constructed salient-channel examples.

The reference's own AWQ path needs the external CUDA `llm-awq` package
(ref quantization.py:178-283) and cannot run here; what CAN be pinned is
the math the bridge delegates to llm-awq: per-group asymmetric quant of
W*diag(s), analytic fold-back Q(W s)/s, and the alpha grid minimizing
sum_j E[x_j]^2 * (W_hat - W)_{:,j}^2 — including the rank-dim B->A pair
(the analogue of ref quantization.py:190-204's prev_op=BLinear,
layers=[ALinear] rewiring).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from asvd4llm_tpu.ops.awq import (  # noqa: E402
    N_GRID, _latent_abs_mean, awq_search_and_quant, groupwise_fake_quant,
)


# ---------------------------------------------------------------- oracle --

def torch_group_quant(w: torch.Tensor, bits: int, group: int
                      ) -> torch.Tensor:
    """Independent per-group asymmetric min-max fake-quant (torch)."""
    out_f, in_f = w.shape
    g = min(group, in_f)
    pad = (-in_f) % g
    wp = torch.nn.functional.pad(w.float(), (0, pad))
    wg = wp.reshape(out_f, -1, g)
    maxq = 2 ** bits - 1
    xmin = torch.clamp(wg.min(dim=-1, keepdim=True).values, max=0)
    xmax = torch.clamp(wg.max(dim=-1, keepdim=True).values, min=0)
    scale = torch.where(xmax - xmin == 0, torch.ones_like(xmax),
                        (xmax - xmin) / maxq)
    zero = torch.round(-xmin / scale)
    q = torch.clamp(torch.round(wg / scale) + zero, 0, maxq)
    return (scale * (q - zero)).reshape(out_f, -1)[:, :in_f]


def torch_awq(w: torch.Tensor, x_mean: torch.Tensor, bits: int,
              group: int) -> torch.Tensor:
    """Independent AWQ search: same grid, same objective, torch ops."""
    w = w.float()
    x = torch.clamp(x_mean.float(), min=1e-8)
    imp = x ** 2

    def err(wq):
        return float(torch.sum((wq - w) ** 2 * imp[None, :]))

    best = torch_group_quant(w, bits, group)
    best_e = err(best)
    for i in range(1, N_GRID):
        s = x ** (i / N_GRID)
        s = s / torch.exp(torch.mean(torch.log(s)))
        wq = torch_group_quant(w * s[None, :], bits, group) / s[None, :]
        e = err(wq)
        if e < best_e:
            best, best_e = wq, e
    return best


# ----------------------------------------------------------------- tests --

@pytest.mark.parametrize("bits,group,shape", [
    (4, 8, (16, 32)),     # multiple groups
    (4, 128, (8, 48)),    # group > in_f (single clamped group)
    (8, 8, (16, 20)),     # padding path (in_f % group != 0)
])
def test_groupwise_quant_matches_torch_oracle(bits, group, shape):
    rng = np.random.RandomState(0)
    w = rng.randn(*shape).astype(np.float32)
    ours = np.asarray(groupwise_fake_quant(jnp.asarray(w), bits, group))
    ref = torch_group_quant(torch.from_numpy(w), bits, group).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("bits", [4, 8])
def test_awq_search_matches_torch_oracle(bits):
    rng = np.random.RandomState(1)
    w = rng.randn(16, 32).astype(np.float32) * 0.1
    # heavy-tailed activations: a few salient channels
    x = np.abs(rng.randn(32)).astype(np.float32)
    x[::7] *= 50.0
    ours = np.asarray(awq_search_and_quant(
        jnp.asarray(w), jnp.asarray(x), bits=bits, group_size=8))
    ref = torch_awq(torch.from_numpy(w), torch.from_numpy(x), bits, 8)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=0, atol=3e-6)


def test_awq_protects_salient_channel_vs_rtn():
    """Hand-constructed case: channel 0 carries huge activations and tiny
    weights next to a large-magnitude channel in the same quant group.
    Plain RTN rounds channel 0's weights to mush; AWQ's scale must
    strictly reduce the activation-weighted error."""
    rng = np.random.RandomState(2)
    w = np.zeros((4, 8), np.float32)
    w[:, 0] = 0.001 * np.array([1, -2, 3, -1])   # salient, tiny weights
    w[:, 1:] = rng.randn(4, 7) * 1.0             # large neighbors
    x = np.full((8,), 0.01, np.float32)
    x[0] = 100.0                                  # channel 0 is salient

    rtn = np.asarray(groupwise_fake_quant(jnp.asarray(w), 4, 8))
    awq = np.asarray(awq_search_and_quant(jnp.asarray(w), jnp.asarray(x),
                                          bits=4, group_size=8))
    imp = np.maximum(x, 1e-8) ** 2

    def err(wq):
        return float(np.sum((wq - w) ** 2 * imp[None, :]))

    assert err(awq) < err(rtn) * 0.9, (err(awq), err(rtn))
    # and channel 0 specifically survives quantization better
    assert (np.abs(awq[:, 0] - w[:, 0]).max()
            < np.abs(rtn[:, 0] - w[:, 0]).max())


def test_awq_alpha0_degenerates_to_rtn():
    """Uniform activations: every scale is 1 after geo-mean normalization,
    so the search must return exactly the RTN quantization."""
    rng = np.random.RandomState(3)
    w = rng.randn(8, 16).astype(np.float32)
    x = np.ones((16,), np.float32)
    got = np.asarray(awq_search_and_quant(jnp.asarray(w), jnp.asarray(x),
                                          bits=4, group_size=8))
    rtn = np.asarray(groupwise_fake_quant(jnp.asarray(w), 4, 8))
    # jit fusion may reassociate the identical-s rescale; ulp-level only
    np.testing.assert_allclose(got, rtn, rtol=0, atol=1e-6)


def test_latent_abs_mean_golden():
    """Hand-computed rank-dim latent statistics: E|t_r| ≈ sum_j |B_rj|E|x_j|
    (the B->A scale pair's driving statistic, ref quantization.py:190-204
    analogue)."""
    B = jnp.asarray([[1.0, -2.0, 0.0],
                     [0.5, 0.0, 4.0]], jnp.float32)
    x = jnp.asarray([3.0, 1.0, 0.25], jnp.float32)
    got = np.asarray(_latent_abs_mean({"B": B}, x))
    np.testing.assert_allclose(got, [1 * 3 + 2 * 1 + 0,
                                     0.5 * 3 + 0 + 4 * 0.25], atol=1e-6)


def test_awq_quantize_model_covers_both_factors():
    """The model-level pass must quantize BOTH low-rank factors (B with
    input stats, A with latent stats) — the SVDLinear-aware scale pair."""
    import jax

    from asvd4llm_tpu.models.init import init_params
    from asvd4llm_tpu.models.registry import is_lowrank, lowrank_leaf
    from asvd4llm_tpu.models.spec import llama_spec
    from asvd4llm_tpu.ops.awq import awq_quantize_model

    spec = llama_spec(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=8,
                      max_position_embeddings=32)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lay = params["layers"][0]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    lay["q_proj"] = lowrank_leaf(jax.random.normal(k1, (16, 4)),
                                 jax.random.normal(k2, (4, 16)), None)
    out = awq_quantize_model(params, spec, 4, group_size=8)
    q = out["layers"][0]["q_proj"]
    assert is_lowrank(q)
    # quantized = changed, and matches a direct call with the same stats
    assert not np.allclose(np.asarray(q["B"]),
                           np.asarray(lay["q_proj"]["B"]))
    x_b = jnp.ones((16,), jnp.float32)
    expect_b = awq_search_and_quant(lay["q_proj"]["B"], x_b, bits=4,
                                    group_size=8)
    np.testing.assert_allclose(np.asarray(q["B"]), np.asarray(expect_b),
                               atol=1e-6)
    expect_a = awq_search_and_quant(
        lay["q_proj"]["A"], _latent_abs_mean(lay["q_proj"], x_b), bits=4,
        group_size=8)
    np.testing.assert_allclose(np.asarray(q["A"]), np.asarray(expect_a),
                               atol=1e-6)
