from virus_nerf_tpu.data.scene import Scene  # noqa: F401
from virus_nerf_tpu.data.sensors import (  # noqa: F401
    RGBDModel,
    SensorModel,
    ToFModel,
    USSModel,
)
from virus_nerf_tpu.data.dataset import DeviceDataset, sample_batch  # noqa: F401
from virus_nerf_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401
