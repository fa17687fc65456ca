"""Device-mesh parallelism: mesh construction, sharded Monte Carlo
reduction, and multi-host initialization (TPU-native replacement of the
reference's ipyparallel task farming)."""

from .mesh import (init_multihost, make_host_chip_mesh,  # noqa: F401
                   make_mesh, shard_batch)
from .timeshard import corrupt_data_time_sharded  # noqa: F401
