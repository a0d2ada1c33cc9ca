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


_DATA_WORKER = textwrap.dedent(
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

    import numpy as np
    from l3embedding_tpu.parallel.distributed import initialize_distributed

    ok = initialize_distributed(
        coordinator_address={coord!r}, num_processes=2, process_id={pid},
    )
    assert ok

    from l3embedding_tpu.parallel import create_mesh, shard_batch_local
    from l3embedding_tpu.training.data import data_generator

    # Pod data path: each process streams its own corpus shard and
    # contributes only its local slice of the global batch.
    gen = data_generator(
        {corpus!r}, batch_size=4, random_state=3,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
        keys=("audio", "label"),
    )
    local = next(gen)
    mesh = create_mesh()  # all 4 cpu devices on the data axis
    global_batch = shard_batch_local(local, mesh)
    # Global shape = per-process batch x process_count.
    assert global_batch["audio"].shape[0] == 8, global_batch["audio"].shape

    # Every row's fingerprint (constant audio = source file index) must
    # be visible globally; a psum over per-shard fingerprint sums proves
    # cross-process assembly. Shard 0 reads files {{0, 2}}, shard 1
    # reads file {{1}}.
    import jax.numpy as jnp
    fp_local = float(np.asarray(local["audio"][:, 0, 0], np.float32).sum())

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def global_fp(x):
        def f(xs):
            return jax.lax.psum(
                jnp.sum(xs[:, 0, 0].astype(jnp.float32)), "data"
            )
        return shard_map(
            f, mesh=mesh, in_specs=(P("data"),), out_specs=P()
        )(x)

    total = float(np.asarray(jax.device_get(global_fp(global_batch["audio"]))))
    print(f"proc {{jax.process_index()}}: local_fp={{fp_local}} "
          f"global_fp={{total}}")
    """
)


def test_two_process_sharded_data_pipeline(tmp_path):
    """Each pod process streams a disjoint corpus shard; shard_batch_local
    assembles the global batch without any host holding all rows."""
    import h5py
    import numpy as np

    corpus = tmp_path / "pod_corpus"
    os.makedirs(corpus)
    for i in range(3):
        with h5py.File(corpus / f"blob_{i}.h5", "w") as f:
            f.create_dataset("audio", data=np.full((6, 1, 16), i, np.int16))
            f.create_dataset(
                "label", data=np.tile([[1.0, 0.0]], (6, 1)).astype(np.float32)
            )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)

    procs = []
    for pid in range(2):
        code = _DATA_WORKER.format(
            repo_root=repo_root, coord=coord, pid=pid, corpus=str(corpus)
        )
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
    fps = {}
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {pid} rc={p.returncode}\nstdout:{out}\nstderr:{err[-2000:]}"
        )
        for line in out.splitlines():
            if line.startswith(f"proc {pid}:"):
                parts = dict(
                    kv.split("=") for kv in line.split(": ")[1].split(" ")
                )
                fps[pid] = (
                    float(parts["local_fp"]), float(parts["global_fp"])
                )
    assert set(fps) == {0, 1}
    # The global fingerprint sum equals the sum of the two local ones,
    # and both processes agree on it.
    assert fps[0][1] == fps[1][1] == fps[0][0] + fps[1][0]
    # Shard 1 reads only file 1 (constant 1): local sum = batch_size.
    assert fps[1][0] == 4.0


_PSYNC_WORKER = textwrap.dedent(
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

    assert initialize_distributed(
        coordinator_address={coord!r}, num_processes=2, process_id={pid},
    )

    from l3embedding_tpu.parallel import create_mesh
    from l3embedding_tpu.training.loop import _PreemptionSync

    class FakeGuard:
        requested = False

    guard = FakeGuard()
    mesh = create_mesh()
    psync = _PreemptionSync(guard, mesh, lag=3)

    # Simulate skewed SIGTERM delivery: ONLY process 0's local flag ever
    # flips (at poll 10). Process 1 must still stop, and both must stop
    # at the SAME poll index (the collective gives every process the
    # identical global-flag sequence).
    break_at = None
    for k in range(50):
        if {pid} == 0 and k == 10:
            guard.requested = True
        if psync.poll():
            break_at = k
            break
    print(f"proc {pid}: break_at={{break_at}}")
    assert break_at is not None, "never stopped"
    # flag contributed at poll 10, read back lag polls later
    assert break_at == 13, break_at
    """
)


def test_preemption_sync_rank_agreement(tmp_path):
    """One rank's SIGTERM must stop ALL ranks at the same poll index —
    otherwise a straggler blocks forever in the next step's collective
    (loop._PreemptionSync)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)

    procs = []
    for pid in range(2):
        code = _PSYNC_WORKER.format(repo_root=repo_root, coord=coord, pid=pid)
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
    indices = []
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {pid} rc={p.returncode}\nstdout:{out}\nstderr:{err[-2000:]}"
        )
        for line in out.splitlines():
            if line.startswith(f"proc {pid}: break_at="):
                indices.append(int(line.split("=")[1]))
    assert indices == [13, 13]


_RUNDIR_WORKER = textwrap.dedent(
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

    assert initialize_distributed(
        coordinator_address={coord!r}, num_processes=2, process_id={pid},
    )

    # Skew this process's clock: without the chief broadcast, the two
    # processes would resolve different timestamped run dirs.
    import datetime as _dt
    from l3embedding_tpu.training import loop as L

    class _FakeDateTime:
        @staticmethod
        def now():
            return _dt.datetime(2026, 1, 1, 0, 0, {pid})

    L.datetime = type("_M", (), {{"datetime": _FakeDateTime}})
    d = L._resolve_run_dir({outdir!r}, "tiny_L3")
    assert os.path.isdir(d), d
    print("proc {pid}: rundir=" + d)
    """
)


def test_two_process_run_dir_agreement(tmp_path):
    """Fresh multi-host runs must agree on ONE timestamped run dir even
    with per-process clock skew (the chief resolves, then broadcasts) —
    otherwise non-chief artifacts and resume hints land in a stray dir."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)

    procs = []
    for pid in range(2):
        code = _RUNDIR_WORKER.format(
            repo_root=repo_root, coord=coord, pid=pid,
            outdir=str(tmp_path / "out"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=280) for p in procs]
    dirs = []
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"proc {pid} rc={p.returncode}\nstdout:{out}\nstderr:{err[-2000:]}"
        )
        line = [ln for ln in out.splitlines() if "rundir=" in ln]
        assert line, out
        dirs.append(line[0].split("rundir=")[1])
    # Both processes resolved the CHIEF's dir (second 0, not second 1).
    assert dirs[0] == dirs[1]
    assert dirs[0].endswith("20260101000000")
