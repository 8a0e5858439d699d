from tfimm_tpu.parallel.mesh import create_mesh, parse_mesh_spec  # noqa: F401
from tfimm_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    spatial_sharding,
    fsdp_param_sharding,
    infer_param_sharding,
    replicated,
    DEFAULT_TP_RULES,
)
from tfimm_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    stack_block_params,
)
from tfimm_tpu.parallel.step import (  # noqa: F401
    make_eval_step,
    make_train_step,
    opt_state_sharding,
)
