from omega_tpu.parallel.decomp import ShardedMesh, decompose, partition_cells
from omega_tpu.parallel.sharded import (
    make_sharded_step,
    shard_state,
    gather_state,
    build_permute_lists,
)
from omega_tpu.parallel import structured_shard
from omega_tpu.parallel import reductions
from omega_tpu.parallel.reductions import global_sum, global_min, global_max
