"""virus_nerf_tpu — a TPU-native (JAX/XLA/Pallas) VIRUS-NeRF framework.

A from-scratch rebuild of the capabilities of nas-git-nas/VIRUS-NeRF
(Instant-NGP-style NeRF fused with ultrasonic + infrared time-of-flight depth
sensors for low-cost robotic mapping), designed TPU-first:

- one functional ``TrainState`` pytree and a single jitted train step,
- static-shape occupancy-guided ray marching (lattice candidates + masked
  compaction instead of the reference's per-thread while loops + atomics),
- pure-XLA / Pallas kernels with explicit ``jax.custom_vjp`` where needed,
- ray-batch data parallelism via ``shard_map`` over a device mesh,
- population-parallel particle-swarm hyper-parameter search.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from virus_nerf_tpu.configs.config import Config, load_config  # noqa: F401
