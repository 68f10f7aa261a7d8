"""HF checkpoint -> params pytree conversion.

The reference loads models with AutoModelForCausalLM fp16 device_map="auto"
(ref asvd.py:23-27). Here a torch model / state dict / local checkpoint dir
is converted once into a JAX pytree (the device placement story is
parallel/sharding.py, not accelerate).

Zero-egress note: in this environment HF downloads are unavailable, so
``load_model`` accepts a local path or an in-memory torch model; tests
construct tiny random transformers models offline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from asvd4llm_tpu.models.registry import dense_leaf, layer_linear_keys
from asvd4llm_tpu.models.spec import DecoderSpec, spec_from_hf_config


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


def _t2j(t, dtype):
    arr = np.asarray(t.detach().to("cpu").float().numpy())
    return jnp.asarray(arr, dtype=dtype)


def _norm_leaf(sd, prefix, dtype, bias=True):
    leaf = {"w": _t2j(sd[f"{prefix}.weight"], dtype)}
    leaf["b"] = _t2j(sd[f"{prefix}.bias"], dtype) if bias and f"{prefix}.bias" in sd else None
    return leaf


def _t2j_raw(t, dtype):
    """Like _t2j but WITHOUT the float() round-trip — for integer payloads
    (packed int4 codes) whose dtype must survive the conversion."""
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "cpu"):
        t = t.cpu()
    arr = np.asarray(t.numpy() if hasattr(t, "numpy") else t)
    return jnp.asarray(arr, dtype=dtype)


def _linear_leaf(sd, prefix, dtype):
    if f"{prefix}.weight" in sd:
        w = _t2j(sd[f"{prefix}.weight"], dtype)
        b = _t2j(sd[f"{prefix}.bias"], dtype) if f"{prefix}.bias" in sd else None
        return dense_leaf(w, b)
    # factored checkpoint (ASVD repo naming: <name>.{A,B}Linear.weight,
    # bias on ALinear — ref modeling_asvd_llama.py:5-12 / our hf_repo.py)
    if f"{prefix}.ALinear.weight" in sd:
        from asvd4llm_tpu.models.registry import lowrank_leaf
        a = _t2j(sd[f"{prefix}.ALinear.weight"], dtype)
        b_factor = _t2j(sd[f"{prefix}.BLinear.weight"], dtype)
        bias = _t2j(sd[f"{prefix}.ALinear.bias"], dtype) \
            if f"{prefix}.ALinear.bias" in sd else None
        return lowrank_leaf(a, b_factor, bias)
    # int8 checkpoint (our hf_repo.py ASVDQ8Linear buffer naming: per-row
    # scale/zero) — loads straight into the fused q8 Pallas serving path
    if f"{prefix}.A_scale" in sd:
        from asvd4llm_tpu.models.registry import q8_lowrank_leaf
        bias = _t2j(sd[f"{prefix}.bias"], dtype) \
            if f"{prefix}.bias" in sd else None
        return q8_lowrank_leaf(
            _t2j_raw(sd[f"{prefix}.A_qweight"], jnp.int8),
            _t2j_raw(sd[f"{prefix}.A_scale"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.A_zero"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.B_qweight"], jnp.int8),
            _t2j_raw(sd[f"{prefix}.B_scale"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.B_zero"], jnp.float32),
            bias)
    # packed-int4 checkpoint (our hf_repo.py ASVDQ4Linear buffer naming):
    # codes stay uint8, scales stay f32 — loads straight into the fused q4
    # Pallas serving path
    if f"{prefix}.A_qweight" in sd:
        from asvd4llm_tpu.models.registry import q4_lowrank_leaf
        bias = _t2j(sd[f"{prefix}.bias"], dtype) \
            if f"{prefix}.bias" in sd else None
        return q4_lowrank_leaf(
            _t2j_raw(sd[f"{prefix}.A_qweight"], jnp.uint8),
            _t2j_raw(sd[f"{prefix}.A_scales"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.A_zero_scales"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.B_qweight"], jnp.uint8),
            _t2j_raw(sd[f"{prefix}.B_scales"], jnp.float32),
            _t2j_raw(sd[f"{prefix}.B_zero_scales"], jnp.float32),
            bias)
    raise KeyError(f"no weights for linear {prefix!r} in state dict")


# HF param-name layout per family: (layer_prefix_fmt, linear key -> HF subpath,
# norm key -> HF subpath)
_HF_LAYOUTS = {
    "llama": {
        "layers": "model.layers.{i}",
        "linears": {k: f"self_attn.{k}" for k in ("q_proj", "k_proj", "v_proj", "o_proj")}
        | {k: f"mlp.{k}" for k in ("gate_proj", "up_proj", "down_proj")},
        "norms": {"ln1": "input_layernorm", "ln2": "post_attention_layernorm"},
        "embed": "model.embed_tokens",
        "final_norm": "model.norm",
    },
    "gemma2": {
        "layers": "model.layers.{i}",
        "linears": {k: f"self_attn.{k}" for k in ("q_proj", "k_proj", "v_proj", "o_proj")}
        | {k: f"mlp.{k}" for k in ("gate_proj", "up_proj", "down_proj")},
        "norms": {"ln1": "input_layernorm",
                  "ln1_post": "post_attention_layernorm",
                  "ln2": "pre_feedforward_layernorm",
                  "ln2_post": "post_feedforward_layernorm"},
        "embed": "model.embed_tokens",
        "final_norm": "model.norm",
    },
    "opt": {
        "layers": "model.decoder.layers.{i}",
        "linears": {k: f"self_attn.{k}" for k in ("q_proj", "k_proj", "v_proj", "out_proj")}
        | {"fc1": "fc1", "fc2": "fc2"},
        "norms": {"ln1": "self_attn_layer_norm", "ln2": "final_layer_norm"},
        "embed": "model.decoder.embed_tokens",
        "embed_positions": "model.decoder.embed_positions",
        "final_norm": "model.decoder.final_layer_norm",
    },
}
_HF_LAYOUTS["gemma"] = _HF_LAYOUTS["llama"]
_HF_LAYOUTS["mistral"] = _HF_LAYOUTS["llama"]


def params_from_state_dict(sd: dict, spec: DecoderSpec, dtype=jnp.bfloat16) -> dict:
    """Convert a torch state dict (HF naming) into our params pytree."""
    if isinstance(dtype, str):
        dtype = _DTYPES[dtype]
    layout = _HF_LAYOUTS[spec.family]

    params: dict = {}
    params["embed_tokens"] = _t2j(sd[f"{layout['embed']}.weight"], dtype)
    if spec.pos_emb == "learned":
        params["embed_positions"] = _t2j(
            sd[f"{layout['embed_positions']}.weight"], dtype)
    # OPT-350m style in/out projections around the decoder stack (stored as
    # linear leaf dicts so they are compressible like any other linear)
    if "model.decoder.project_in.weight" in sd:
        params["project_in"] = _linear_leaf(sd, "model.decoder.project_in", dtype)
        params["project_out"] = _linear_leaf(sd, "model.decoder.project_out", dtype)

    layers = []
    for i in range(spec.num_layers):
        pfx = layout["layers"].format(i=i)
        layer: dict = {}
        for key in layer_linear_keys(spec):
            layer[key] = _linear_leaf(sd, f"{pfx}.{layout['linears'][key]}", dtype)
        for nkey, sub in layout["norms"].items():
            layer[nkey] = _norm_leaf(sd, f"{pfx}.{sub}", dtype)
        layers.append(layer)
    params["layers"] = layers

    fn_key = f"{layout['final_norm']}.weight"
    params["final_norm"] = _norm_leaf(sd, layout["final_norm"], dtype) \
        if fn_key in sd else None

    if not spec.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _linear_leaf(sd, "lm_head", dtype)
    else:
        params["lm_head"] = None
    return params


def params_from_torch_model(model, dtype=jnp.bfloat16) -> tuple[dict, DecoderSpec]:
    """Convert an in-memory transformers CausalLM into (params, spec)."""
    spec = spec_from_hf_config(model.config)
    sd = dict(model.state_dict())
    return params_from_state_dict(sd, spec, dtype), spec


class _NumpyTensor:
    """Duck-typed stand-in for a torch tensor in _t2j (numpy-backed)."""

    def __init__(self, arr):
        self._arr = arr

    def detach(self):
        return self

    def to(self, *_):
        return self

    def float(self):
        return _NumpyTensor(self._arr.astype(np.float32))

    def numpy(self):
        return self._arr


def load_model_native(model_dir: str, dtype=jnp.bfloat16
                      ) -> tuple[dict, DecoderSpec]:
    """Torch-free checkpoint load: native mmap'd safetensors reader
    (utils/tensorio, C++ dtype conversion) + config.json -> (params, spec).
    The fast path for big checkpoints — no torch module tree is ever
    built (unlike the reference's AutoModelForCausalLM load,
    ref asvd.py:25-27)."""
    from transformers import AutoConfig

    from asvd4llm_tpu.utils.tensorio import load_safetensors_state_dict

    config = AutoConfig.from_pretrained(model_dir)
    spec = spec_from_hf_config(config)
    raw = load_safetensors_state_dict(model_dir, to_f32=True)
    sd = {k: _NumpyTensor(v) for k, v in raw.items()}
    # HF may omit tied lm_head / use "model."-less names; normalize common
    # aliases
    if spec.tie_word_embeddings and "lm_head.weight" in sd:
        pass  # params_from_state_dict ignores it for tied specs
    return params_from_state_dict(sd, spec, dtype), spec


def load_model(model_id_or_path: str, dtype=jnp.bfloat16,
               trust_remote_code: bool = True) -> tuple[dict, DecoderSpec, object]:
    """Load (params, spec, tokenizer) from a local HF checkpoint directory
    or hub id (hub requires network). Mirrors the reference's entry
    (ref asvd.py:23-27) minus device_map."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(
        model_id_or_path, trust_remote_code=trust_remote_code)
    model = AutoModelForCausalLM.from_pretrained(
        model_id_or_path, torch_dtype=torch.float32,
        trust_remote_code=trust_remote_code)
    params, spec = params_from_torch_model(model, dtype)
    del model
    return params, spec, tokenizer
