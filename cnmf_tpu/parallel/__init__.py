from cnmf_tpu.parallel.mesh import (
    build_mesh,
    shard_factorize_inputs,
    pad_to_multiple,
)
