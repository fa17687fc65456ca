"""Mesh helpers: the communication/parallelism backbone.

TPU-native replacement for the reference's distributed backend (ipyparallel
ZMQ task farming, SURVEY §2.11): Monte Carlo data parallelism is expressed
as a 1-D (or 2-D host x chip) ``jax.sharding.Mesh`` over which repetition
batches are sharded; error-counter reduction happens inside XLA via
``psum`` (collectives ride ICI, not sockets). Multi-host initialization
wraps ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "make_host_chip_mesh", "shard_batch",
           "init_multihost"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "mc") -> Mesh:
    """A 1-D mesh over all (or the given) local devices, for sharding
    Monte Carlo repetition batches. An integer is accepted as a count
    (the first ``devices`` local devices)."""
    if devices is None:
        devices = jax.devices()
    elif isinstance(devices, int):
        devices = jax.devices()[:devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_host_chip_mesh(num_hosts: Optional[int] = None,
                        axis_names: Sequence[str] = ("host", "chip"),
                        devices: Optional[Sequence] = None) -> Mesh:
    """A 2-D ``(host, chip)`` mesh: the outer axis crosses hosts (DCN),
    the inner axis stays within a host (ICI). Shard the SNR sweep (or
    realization super-batches) over ``host`` — one collective per sweep,
    amortized over DCN — and realizations over ``chip`` where psum rides
    ICI. On a single host, ``num_hosts`` splits the local devices into
    virtual host groups (how the tests and the driver dry run exercise
    the two-axis layout without a pod)."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    if num_hosts is None:
        num_hosts = max(jax.process_count(), 1)
    if devices.size % num_hosts != 0:
        raise ValueError(
            f"{devices.size} devices do not split into {num_hosts} hosts")
    grid = devices.reshape(num_hosts, devices.size // num_hosts)
    return Mesh(grid, tuple(axis_names))


def shard_batch(mesh: Mesh, x, axis_name: str = "mc"):
    """Place a batch array (leading axis = repetitions) so that it is
    sharded across the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.device_put(x, sharding)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize multi-host jax (pod-slice execution). Safe to call when
    already initialized."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError:
        pass  # already initialized
