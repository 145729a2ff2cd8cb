"""Utilities: numeric/plotting/system helpers, deployment export, logging.

Counterpart of the reference's helpers/ package + modules/utils.py host side.
"""

from virus_nerf_tpu.utils.deployment import (  # noqa: F401
    infer_density_map,
    save_deployment_model,
)
from virus_nerf_tpu.utils.helpers import (  # noqa: F401
    check_device_memory,
    combine_imgs,
    convolve_ignore_nans,
    data_converged,
    depth2img,
    downsample_data,
    lin_interpolate_array,
    lin_interpolate_nans,
    sensor_id2name,
    sensor_name2id,
    smooth_ignore_nans,
)
from virus_nerf_tpu.utils.logging import make_logger  # noqa: F401
