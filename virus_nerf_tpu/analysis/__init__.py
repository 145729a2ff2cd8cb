"""Offline result/experiment analysis (no JAX, no training deps).

Counterpart of the reference's ``plotting/`` tree
(reference: plotting/{datasets,training,USS_experiments,optimization}):

- :mod:`.uss_experiments` — lab bench characterization of the ultrasonic
  sensors (polar error fans, cross-sensor comparison, tilted-object study)
  from the experiment CSV layout.
- :mod:`.result_plots` — result-directory analyses: calibration-error bar
  charts and NeRF point-cloud scatter maps.

PSO result-directory analyses live in :mod:`virus_nerf_tpu.optimization.plots`
(reference: optimization/plotter_ethz.py, plotting/optimization/).
"""

from .result_plots import plot_calibration_error, plot_pointclouds
from .uss_experiments import (
    USSExperimentData,
    load_experiment_csv,
    plot_angular_characterization,
    plot_sensor_comparison,
    plot_tilted_object,
)

__all__ = [
    "USSExperimentData",
    "load_experiment_csv",
    "plot_angular_characterization",
    "plot_sensor_comparison",
    "plot_tilted_object",
    "plot_calibration_error",
    "plot_pointclouds",
]
