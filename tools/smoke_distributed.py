"""Two-process jax.distributed smoke for parallel.mesh.init_distributed().

Exercises the real multi-host coordination path (coordinator rendezvous,
cross-process device visibility, an AllReduce over DCN) that the virtual
8-device mesh cannot: two OS processes, one CPU device each, one global mesh,
one psum. Replaces the reference's torch.distributed env:// rendezvous
(/root/reference/train_ms.py:85-86, hardcoded localhost) with a working
multi-process bring-up.

Run: python tools/smoke_distributed.py        (parent: spawns 2 children)
     python tools/smoke_distributed.py --child  (internal)
"""
import os
import subprocess
import sys


def child() -> None:
    # the image pre-imports jax at interpreter startup, so env vars are too
    # late — force CPU through the live config before any backend initializes
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from megatts2_hierspeechpp_tpu.parallel.mesh import init_distributed

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    pid = jax.process_index()

    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    # each process contributes one row: global (2, 8) with rows (1s, 2s)
    local = np.full((1, 8), pid + 1.0, np.float32)
    arr = jax.make_array_from_process_local_data(sh, local)

    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)  # cross-process AllReduce: fully-addressable replicated output
    got = float(total)
    assert got == 24.0, got
    print(f"proc {pid}: psum ok ({got})", flush=True)


def parent() -> int:
    port = int(os.environ.get("SMOKE_DIST_PORT", "56321"))
    procs = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pid in range(2):
        env = dict(os.environ)
        # keep the axon plugin path if present, and make the repo importable
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in [env.get("PYTHONPATH"), repo] if p]
        )
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        print(f"--- proc {pid} (exit {p.returncode}) ---\n{out}")
        rc = rc or p.returncode
    print("SMOKE_DISTRIBUTED", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(parent())
