"""Device-mesh parallelism: mesh construction, sharded Monte Carlo
reduction, and multi-host initialization (TPU-native replacement of the
reference's ipyparallel task farming)."""

from .mesh import make_mesh, shard_batch  # noqa: F401
from .timeshard import corrupt_data_time_sharded  # noqa: F401
