from asvd4llm_tpu.models.spec import DecoderSpec, spec_from_hf_config  # noqa: F401
from asvd4llm_tpu.models.decoder import forward, forward_with_stats  # noqa: F401
from asvd4llm_tpu.models.registry import (  # noqa: F401
    iter_linears, get_linear, set_linear, linear_names,
    dense_leaf, lowrank_leaf, is_lowrank, count_linear_params,
)
from asvd4llm_tpu.models.loader import (  # noqa: F401
    params_from_torch_model, load_model,
)
