"""Real 2-process jax.distributed coordination on CPU: maybe_initialize,
process_batch_slice, and a cross-process global array + collective —
the multi-host path exercised by actual separate processes instead of
virtual devices."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpgan_tpu.parallel.distributed import (
        maybe_initialize, process_batch_slice,
    )

    pid = int(sys.argv[1])
    ok = maybe_initialize(
        coordinator_address="127.0.0.1:%PORT%",
        num_processes=2,
        process_id=pid,
    )
    assert ok, "maybe_initialize returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert process_batch_slice(128) == 64

    # host-sharded input: each process contributes its local slice of a
    # global batch; a jitted global mean must see BOTH halves
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    local = np.full((4, 2), float(pid + 1), np.float32)  # proc0: 1s, proc1: 2s
    global_batch = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (8, 2)
    )
    mean = jax.jit(jnp.mean, out_shardings=NamedSharding(mesh, P()))(global_batch)
    got = float(mean)
    assert abs(got - 1.5) < 1e-6, got
    print(f"proc{pid} OK mean={got}")
    """
)


def test_two_process_distributed(tmp_path):
    # formerly TPGAN_SLOW_TESTS-gated; un-gated because it is the cheap
    # one of the slow set (~2 min: two jax imports + a tiny compile) and
    # real multi-process coordination should run in every default suite
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("%PORT%", str(port)))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # the worker runs from a tmp script file: python puts the SCRIPT's
    # dir on sys.path, not the cwd — point it at the repo explicitly
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out


def test_process_batch_slice_single():
    from tpgan_tpu.parallel.distributed import process_batch_slice

    # single process: identity (divisibility errors only fire multi-proc)
    assert process_batch_slice(128) == 128
