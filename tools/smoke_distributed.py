"""Two-process jax.distributed smoke for parallel.mesh.init_distributed().

Exercises the real multi-host coordination path (coordinator rendezvous,
cross-process device visibility, an AllReduce over DCN) that the virtual
8-device mesh cannot: two OS processes, one CPU device each, one global mesh,
one psum. Replaces the reference's torch.distributed env:// rendezvous
(/root/reference/train_ms.py:85-86, hardcoded localhost) with a working
multi-process bring-up.

--train additionally runs ONE s2 GAN train step data-parallel across the two
processes (4 virtual CPU devices each -> one global 8-device 'data' mesh):
params init replicated from a shared seed, each process feeds its half of
the global batch, XLA inserts the cross-process gradient all-reduces, and
the parent asserts both processes computed the SAME losses and post-update
parameter checksum — the actual multi-host training contract.

Run: python tools/smoke_distributed.py [--train]  (parent: spawns 2 children)
     python tools/smoke_distributed.py --child [--train]  (internal)
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


def child_train() -> None:
    """One data-parallel s2 GAN train step across both processes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from megatts2_hierspeechpp_tpu.models.discriminators import (
        MultiResSpecDiscriminator,
    )
    from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
    from megatts2_hierspeechpp_tpu.parallel.mesh import (
        init_distributed,
        make_mesh,
        shard_batch,
    )
    from megatts2_hierspeechpp_tpu.train.optim import adamw
    from megatts2_hierspeechpp_tpu.train.s2 import create_state, make_train_step
    from __graft_entry__ import _s2_batch

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    pid = jax.process_index()

    mesh = make_mesh(n_data=8)
    # identical global batch on both processes (same seed inside _s2_batch);
    # device_put only populates each process's addressable shards
    batch = _s2_batch(8)
    ttv = TTVModel(n_vocab=40, n_tone=10, n_language=3, text_layers=1,
                   mel_enc_layers=1, w2v_enc_layers=1, w2v_dec_layers=2)
    tx = adamw(1e-4, steps_per_epoch=10)
    with mesh:
        state = create_state(ttv, MultiResSpecDiscriminator(), tx, tx,
                             jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(ttv, MultiResSpecDiscriminator(),
                                       tx, tx))
        state, metrics = step(state, shard_batch(mesh, batch),
                              jax.random.PRNGKey(1))
        jax.block_until_ready(metrics)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # post-update parameter checksum: replicated outputs must agree bitwise
    # across processes (would diverge if the grad all-reduce were broken)
    leaves = jax.tree.leaves(state.params_g)
    csum = float(sum(jax.jit(lambda x: jax.numpy.sum(
        jax.numpy.abs(x.astype(jax.numpy.float64))))(l) for l in leaves))
    print(f"proc {pid}: train ok g={vals['loss/g/total']:.6f} "
          f"d={vals['loss/d/total']:.6f} csum={csum:.6e}", flush=True)


def parent(train: bool) -> int:
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
        if train:  # 4 virtual devices per process -> 8-device global mesh
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        else:
            env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"]
            + (["--train"] if train else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    rc = 0
    lines = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900 if train else 300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        print(f"--- proc {pid} (exit {p.returncode}) ---\n{out}")
        rc = rc or p.returncode
        ok = [l for l in out.splitlines() if "train ok" in l or "psum ok" in l]
        lines.extend(ok)
    if train and rc == 0:
        # both processes must report the same losses + param checksum
        payload = [l.split(":", 1)[1] for l in lines]
        if len(payload) != 2 or payload[0] != payload[1]:
            print("MISMATCH:", lines)
            rc = 1
    print("SMOKE_DISTRIBUTED", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_train() if "--train" in sys.argv else child()
    else:
        sys.exit(parent("--train" in sys.argv))
