"""SPMD parallelism over a jax.sharding.Mesh.

TPU-native replacement for the reference's torch DistributedDataParallel
stack (/root/reference/utils.py:268-312, train.py:702-712): a 1-D "data" mesh
over ICI (multi-host over DCN via jax.distributed.initialize), batch sharded
on the leading axis, params replicated; XLA inserts the gradient all-reduce
that DDP performed explicitly. Metric reduction uses jnp sums on sharded
arrays instead of reduce_dict/all_gather.
"""

from snn_automotive_object_detection_tpu.parallel.mesh import (
    data_parallel_mesh,
    init_distributed,
    is_main_process,
    replicate,
    shard_batch,
)
