from internnav_tpu.parallel.collectives import (
    all_reduce_mean,
    get_rank,
    get_world_size,
    grad_allreduce,
    host_broadcast,
    is_main_process,
    psum_mean,
    save_on_master,
)
from internnav_tpu.parallel.mesh import (
    data_sharding,
    fsdp_param_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from internnav_tpu.parallel.tp import qwen_tp_sharding

__all__ = [
    "all_reduce_mean", "get_rank", "get_world_size", "grad_allreduce",
    "host_broadcast", "is_main_process", "psum_mean", "save_on_master",
    "data_sharding", "fsdp_param_sharding", "make_mesh", "replicated",
    "shard_batch", "qwen_tp_sharding",
]
