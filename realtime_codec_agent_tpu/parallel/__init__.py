from .mesh import (
    make_mesh,
    default_mesh_shape,
    lm_param_specs,
    batch_spec,
    shard_params,
    shard_lm_for_inference,
    shard_batched_engine_for_serving,
)
from .pipeline import make_pipeline_forward
