"""Evaluation: mapping NND metrics, PSNR/SSIM, scan rendering.

Counterpart of the reference's Metrics/MetricsRH + Trainer.evaluate
(reference: training/metrics.py, training/trainer.py:167-866).
"""

from virus_nerf_tpu.evaluation.evaluator import Evaluator  # noqa: F401
from virus_nerf_tpu.evaluation.geometry import (  # noqa: F401
    create_scan_pos,
    create_scan_rays,
    find_nearest_neighbour,
    limit_fov,
)
from virus_nerf_tpu.evaluation.metrics import (  # noqa: F401
    mae,
    mare,
    nn_metrics,
    psnr,
    rmse,
    ssim,
)
