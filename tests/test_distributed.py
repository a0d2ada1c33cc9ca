"""Multi-host initialization exercised for real: two local processes form
a jax.distributed cluster over CPU devices and run a cross-process psum.

This proves parallel/distributed.initialize_distributed is a working pod
path (SURVEY.md §5.8 extension claim), not dead code: process 0 is the
coordinator, both processes see the global device set, and a shard_map
psum reduces across process boundaries.
"""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo_root!r})

    from l3embedding_tpu.parallel.distributed import initialize_distributed

    ok = initialize_distributed(
        coordinator_address={coord!r},
        num_processes=2,
        process_id={pid},
    )
    assert ok, "initialize_distributed returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), axis_names=("data",))

    @jax.jit
    def global_sum():
        def f():
            return jax.lax.psum(
                jnp.float32(jax.process_index() + 1.0), "data"
            )
        return shard_map(f, mesh=mesh, in_specs=(), out_specs=P())()

    total = float(np.asarray(jax.device_get(global_sum())))
    # processes 0 and 1 contribute (pid+1) per local device: 2*1 + 2*2.
    assert total == 6.0, total
    print(f"proc {pid}: psum={{total}} nprocs={{jax.process_count()}}")
    """
)


def test_two_process_cpu_cluster(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)

    procs = []
    for pid in range(2):
        code = _WORKER.format(repo_root=repo_root, coord=coord, pid=pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=280) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {pid} rc={p.returncode}\nstdout:{out}\nstderr:{err[-2000:]}"
        )
        assert f"proc {pid}: psum=6.0 nprocs=2" in out
