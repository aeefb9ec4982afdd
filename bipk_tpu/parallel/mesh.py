"""Device-mesh helpers for particle-axis sharding."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = "p"


def particle_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the particle axis.

    The reference is single-device (SURVEY.md §2: no pmap/pjit/shard_map
    anywhere); particles are embarrassingly parallel apart from weight
    normalization and resampling, so a 1-D mesh is the natural layout —
    collectives ride ICI within a slice.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PARTICLE_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
