from asvd4llm_tpu.eval.ppl import (  # noqa: F401
    evaluate_perplexity, evaluate_ppl_windowed,
)
