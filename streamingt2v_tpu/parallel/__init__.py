from streamingt2v_tpu.parallel.mesh import (  # noqa: F401
    AXIS_DATA,
    AXIS_MODEL,
    AXIS_SEQ,
    create_mesh,
    local_mesh,
    mesh_shape_for,
)
from streamingt2v_tpu.parallel.multihost import (  # noqa: F401
    create_multihost_mesh,
    global_batch_from_local,
    initialize,
    process_batch_slice,
)
from streamingt2v_tpu.parallel.sharding import (  # noqa: F401
    LOGICAL_RULES,
    logical_sharding,
    shard_activations,
    shard_params,
    with_sharding,
)
