from asvd4llm_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, param_shardings, shard_params, data_sharding,
)
