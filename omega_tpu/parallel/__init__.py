from omega_tpu.parallel.decomp import ShardedMesh, decompose
from omega_tpu.parallel.sharded import (
    make_sharded_step,
    shard_state,
    gather_state,
)
