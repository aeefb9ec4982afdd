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


CHAIN_AXIS = "c"


def chain_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the Gibbs-chain axis.

    Reference-scale workloads (a few hundred particles,
    ``/root/reference/src/Vehicle.py:180``) occupy a sliver of one chip, so
    sharding *particles* across a slice is wasted ICI; the right multi-chip
    layout for them is one group of independent chains per device —
    embarrassingly parallel, zero collectives, linear scaling. Used by
    ``build_gibbs(..., n_chains=C, chain_mesh=chain_mesh(D))``.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (chain) sharding on ``mesh``'s first axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
