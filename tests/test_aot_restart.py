"""AOT-persisted serving executables across a REAL process restart
(VERDICT r2 #9).

Two subprocesses share one executable store: the first compiles + persists
every per-bucket executable; the second — a genuine server restart — must
load them all (misses == 0, zero trace/lower/compile) and produce
byte-identical audio. Subprocesses are required for honesty AND correctness:
XLA:CPU cannot reload an executable into a process that already jit-compiled
the same program (see infer/aot.py docstring).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import os, sys, json, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np
import tests.test_pipeline as tp

store, out_npy = sys.argv[1], sys.argv[2]
pipe = dataclasses.replace(tp.pipeline.__wrapped__(), aot_dir=store)
prompt = (np.random.default_rng(21).uniform(-0.3, 0.3, 32000)).astype(np.float32)
pf = pipe.prepare_prompt(prompt)
t0 = time.perf_counter()
wav = pipe.tts("sil zh ang1 h ao3 sp", prompt=pf, seed=5, noise_scale_vc=0.0)
elapsed = time.perf_counter() - t0
np.save(out_npy, wav)
print("RESULT " + json.dumps({"stats": pipe.aot_stats(), "tts_s": elapsed}))
"""


def _run(store: str, out_npy: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER, store, out_npy],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


@pytest.mark.slow
def test_restart_loads_all_executables(tmp_path):
    store = str(tmp_path / "aot_store")
    first = _run(store, str(tmp_path / "wav1.npy"))
    assert first["stats"]["misses"] > 0 and first["stats"]["hits"] == 0
    assert len(os.listdir(store)) == first["stats"]["misses"]

    restart = _run(store, str(tmp_path / "wav2.npy"))
    assert restart["stats"]["misses"] == 0, f"restart recompiled: {restart}"
    assert restart["stats"]["hits"] == first["stats"]["misses"]

    wav1 = np.load(tmp_path / "wav1.npy")
    wav2 = np.load(tmp_path / "wav2.npy")
    np.testing.assert_array_equal(wav1, wav2)
