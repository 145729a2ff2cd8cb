from virus_nerf_tpu.ops.common import (  # noqa: F401
    MAX_SAMPLES,
    NEAR_DISTANCE,
    SQRT3,
    SQRT3_MAX_SAMPLES,
    SQRT3_2,
    trunc_exp,
    calc_dt,
    mip_from_pos,
    mip_from_dt,
)
from virus_nerf_tpu.ops.morton import (  # noqa: F401
    morton3d,
    morton3d_invert,
    packbits,
    unpackbits,
)
from virus_nerf_tpu.ops.sh import sh_encode  # noqa: F401
from virus_nerf_tpu.ops.intersection import ray_aabb_intersect  # noqa: F401
from virus_nerf_tpu.ops.hash_encoder import HashGridSpec, hash_encode  # noqa: F401
from virus_nerf_tpu.ops.ray_march import march_rays_train  # noqa: F401
from virus_nerf_tpu.ops.composite import composite_rays  # noqa: F401
