from asvd4llm_tpu.data.datasets import (  # noqa: F401
    get_calib_data, get_eval_tokens, synthetic_token_corpus,
)
