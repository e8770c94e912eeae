"""Device-mesh parallelism utilities."""

from fqss_tpu.parallel.fsdp import fsdp_sharding, shard_state_fsdp
from fqss_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from fqss_tpu.parallel.pp import layer_stack_vars, pipeline_apply, pipeline_layer_module, shard_layer_stack
from fqss_tpu.parallel.tp import shard_variables_tp, transformer_tp_specs

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_variables_tp",
    "transformer_tp_specs",
    "fsdp_sharding",
    "shard_state_fsdp",
    "layer_stack_vars",
    "pipeline_apply",
    "pipeline_layer_module",
    "shard_layer_stack",
]
