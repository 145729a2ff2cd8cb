from virus_nerf_tpu.grids.base import (  # noqa: F401
    GridState,
    bitfield_from_grid,
    cartesian_to_morton,
    morton_to_cartesian,
    occ_bool_from_grid,
)
from virus_nerf_tpu.grids.ngp_grid import NGPGridState, ngp_grid_init, ngp_grid_update  # noqa: F401
from virus_nerf_tpu.grids.occupancy_grid import (  # noqa: F401
    OccGridHParams,
    OccGridState,
    occ_grid_apply_delta,
    occ_grid_delta,
    occ_grid_init,
    occ_grid_update,
)
