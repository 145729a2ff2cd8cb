from virus_nerf_tpu.parallel.data_parallel import (  # noqa: F401
    make_mesh,
    make_dp_occ_update,
    make_dp_train_chunk,
    make_dp_train_step,
)
from virus_nerf_tpu.parallel.population import (  # noqa: F401
    make_population_eval,
    population_devices,
)
