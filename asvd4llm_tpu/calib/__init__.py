from asvd4llm_tpu.calib.stats import calib_input_distribution  # noqa: F401
from asvd4llm_tpu.calib.fisher import calib_fisher_info  # noqa: F401
from asvd4llm_tpu.calib.sensitivity import (  # noqa: F401
    calib_sensitivity_ppl, calib_sensitivity_stable_rank,
)
from asvd4llm_tpu.calib.search import binary_search_truncation_rank  # noqa: F401
