from virus_nerf_tpu.training.loss import LossWeights, compute_loss  # noqa: F401
from virus_nerf_tpu.training.trainer import Trainer, TrainState  # noqa: F401
