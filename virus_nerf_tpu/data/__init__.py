from virus_nerf_tpu.data.scene import Scene  # noqa: F401
from virus_nerf_tpu.data.sensors import (  # noqa: F401
    RGBDModel,
    SensorModel,
    ToFModel,
    USSModel,
)
from virus_nerf_tpu.data.dataset import DeviceDataset, sample_batch  # noqa: F401
from virus_nerf_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401


def make_dataset(cfg, split: str = "train", scene=None):
    """Dataset factory by config name: 'synthetic' | 'ETHZ' | 'RH2'
    (counterpart of the per-script dataset construction,
    reference: training/trainer_base.py:42-65).

    Returns (DeviceDataset, Scene, info).
    """
    name = cfg.dataset.name
    if name == "synthetic":
        return make_synthetic_dataset()
    if name == "ETHZ":
        from virus_nerf_tpu.data.ethz import load_ethz_dataset

        return load_ethz_dataset(cfg, split=split, scene=scene)
    if name == "RH2":
        from virus_nerf_tpu.data.rh import load_rh_dataset

        return load_rh_dataset(cfg, split=split, scene=scene)
    raise ValueError(f"unknown dataset {name}")
