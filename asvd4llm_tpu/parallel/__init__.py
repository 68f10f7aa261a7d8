from asvd4llm_tpu.parallel.mesh import (  # noqa: F401
    data_sharding, make_mesh, make_multislice_mesh, param_shardings,
    shard_params,
)
