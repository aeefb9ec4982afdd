"""Multi-host (DCN) smoke test: two real processes, one global mesh.

Exercises ``bipk_tpu.parallel.distributed.init_distributed`` end-to-end:
two OS processes join a coordinator, build a global 4-device mesh (2
virtual CPU devices per process), and run a ``shard_map`` + ``psum``
program whose collective crosses the process (DCN) boundary. This is the
cross-host analogue of the single-process virtual-mesh tests in
``test_sharded.py``. (The reference has no distributed backend at all —
SURVEY.md §5.)
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys

    sys.path.insert(0, {repo!r})
    import numpy as np

    from bipk_tpu.parallel import distributed

    port, pid = sys.argv[1], int(sys.argv[2])
    distributed.init_distributed(
        coordinator_address=f"127.0.0.1:{{port}}",
        num_processes=2,
        process_id=pid,
        local_device_count=2,
    )
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    mesh = distributed.global_particle_mesh()

    def body(x):
        return jax.lax.psum(jnp.sum(x), "p") * jnp.ones_like(x)

    fn = jax.jit(
        shard_map(body, mesh=mesh, in_specs=P("p"), out_specs=P("p"))
    )
    # globally-shaped input, sharded over the 4 global devices
    x = jax.make_array_from_callback(
        (8,),
        NamedSharding(mesh, P("p")),
        lambda idx: np.arange(8.0, dtype=np.float32)[idx],
    )
    out = fn(x)
    # every element must equal sum(0..7) = 28 — the psum crossed DCN
    local = np.asarray(
        [np.asarray(s.data) for s in out.addressable_shards]
    )
    assert np.allclose(local, 28.0), local
    print(f"proc {{pid}} OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own virtual device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
