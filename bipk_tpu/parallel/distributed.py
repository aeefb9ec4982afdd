"""Multi-host (DCN) initialization and global mesh construction.

The reference is strictly single-process (no ``jax.distributed``, no
collective backend anywhere — SURVEY.md §2/§5). Scaling the particle axis
beyond one TPU slice host requires the standard JAX multi-process runtime:
every host calls :func:`init_distributed` first, after which
``jax.devices()`` spans all hosts and a global mesh built from it makes
``shard_map``/``pjit`` collectives ride ICI within a slice and DCN across
hosts — no custom transport.

Typical SPMD launch (same program on every host)::

    from bipk_tpu.parallel import distributed, mesh
    distributed.init_distributed()          # env-based discovery on TPU pods
    m = distributed.global_particle_mesh()  # 1-D mesh over ALL devices
    run = build_sharded_apf(ssm, gps, n_particles, m, ...)

On TPU pods ``jax.distributed.initialize`` discovers the coordinator from
the environment automatically; for manual/CPU clusters pass
``coordinator_address``, ``num_processes``, ``process_id`` explicitly.
"""

from __future__ import annotations

import os

import jax

from bipk_tpu.parallel.mesh import particle_mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    ``local_device_count`` forces that many *virtual CPU devices* on this
    process (testing multi-host logic without TPU hardware); it must be set
    before the first backend-initializing JAX call, and implies the CPU
    platform.
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count="
                f"{local_device_count}"
            ).strip()
        # config.update, not the env var: some TPU plugins (e.g. axon)
        # ignore JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")

    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_particle_mesh(n_devices: int | None = None):
    """1-D particle mesh over all devices of all processes.

    Call after :func:`init_distributed`. With ``n_devices`` the mesh is
    truncated to the first ``n_devices`` global devices (must divide the
    per-process device layout evenly for XLA to place collectives).
    """
    n = n_devices if n_devices is not None else len(jax.devices())
    return particle_mesh(n)
