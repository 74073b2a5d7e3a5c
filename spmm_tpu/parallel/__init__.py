"""Distributed execution: meshes, row-sharded sparse matrices, sparse
collectives (the `cupyx.distributed` analogue, re-designed for ICI)."""

from spmm_tpu.parallel.mesh import (  # noqa: F401
    init_process_group,
    make_mesh,
    replicated,
    row_sharded,
)
from spmm_tpu.parallel.sharded import (  # noqa: F401
    ShardedCSR,
    SpmvStreamPlan,
    shard_csr,
    shard_vector,
    spgemm_dense_sharded,
    spmm_sharded,
    spmv_sharded,
    spmv_sharded_blocked,
    spmv_sharded_streamed,
    spmv_stream_plan,
    spmv_t_sharded,
    unshard_rows,
)
from spmm_tpu.parallel import collectives  # noqa: F401
from spmm_tpu.parallel.summa import (  # noqa: F401
    make_mesh_2d,
    spgemm_summa,
)
