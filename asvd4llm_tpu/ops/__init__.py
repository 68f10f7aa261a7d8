from asvd4llm_tpu.ops.asvd import (  # noqa: F401
    LowRankFactors,
    rank_for_param_ratio,
    build_scaling_vector,
    factorize_linear,
)
from asvd4llm_tpu.ops.svd import truncated_svd, randomized_svd  # noqa: F401
from asvd4llm_tpu.ops.lowrank import lowrank_apply, dense_apply  # noqa: F401
