from asvd4llm_tpu.utils.cache import ArtifactCache  # noqa: F401
