from virus_nerf_tpu.models.ngp import NGPModel, NGPParams  # noqa: F401
from virus_nerf_tpu.models.renderer import render_rays  # noqa: F401
