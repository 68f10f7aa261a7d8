"""asvd4llm_tpu — TPU-native activation-aware SVD compression for causal LMs.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
hahnyuan/ASVD4LLM (training-free post-training low-rank compression):

- calibration of per-input-channel activation statistics (abs-mean /
  abs-max / Fisher) as jitted functional sweeps (ref: act_aware_utils.py),
- activation-aware truncated SVD factorization of linear layers
  (ref: modules/svd_linear.py),
- per-layer sensitivity scanning and binary-search rank allocation against
  parameter-ratio / PPL / KV-cache-ratio targets (ref: sensitivity.py,
  binary_search.py),
- RTN / AWQ-style quantization of the low-rank factors
  (ref: quantization.py),
- perplexity / task / LongBench evaluation (ref: evaluate_utils.py,
  tools/eval_longbench.py),
- export + reload of compressed checkpoints with a rank manifest
  (ref: huggingface_repos/),

all built on params-as-pytrees, pjit sharding over a TPU mesh, and Pallas
kernels for the hot low-rank ops.
"""

__version__ = "0.1.0"

from asvd4llm_tpu.config import ASVDConfig  # noqa: F401
