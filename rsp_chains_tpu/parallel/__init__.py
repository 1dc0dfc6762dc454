from .mesh import CHANNEL_AXIS, RANGE_AXIS, auto_mesh, chain_spec, make_mesh
from .halo import exchange_halo, extend_with_halo
from .sharded import (
    cfar_halo_shard,
    channel_sharded,
    make_sharded_pipeline,
    range_sharded_fir,
    range_sharded_mag_cfar,
)
