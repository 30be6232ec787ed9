from megatron_clip_tpu.parallel.mesh import (  # noqa: F401
    build_mesh, MeshAxes, DATA, FSDP, TENSOR, STAGE, CONTEXT, batch_spec)
from megatron_clip_tpu.parallel.sharding import (  # noqa: F401
    clip_param_specs, transformer_block_specs, shard_params, make_sharding_tree)
