from asvd4llm_tpu.export.checkpoint import (  # noqa: F401
    save_compressed, load_compressed,
)
from asvd4llm_tpu.export.hf_repo import export_hf_repo  # noqa: F401
