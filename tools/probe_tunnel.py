"""Probe axon-tunnel health: per-call dispatch latency + host round-trip.

The repo's TPU is reached over a tunnel whose latency fluctuates by ~10x
between sessions (healthy: ~0.5-1 ms queued dispatch, ~10 ms round-trip;
degraded, measured 2026-08-20: 5-11 ms queued, 60-100 ms round-trip).
Every throughput number in BASELINE.md is tunnel-sensitive below ~1 s of
device compute per call — run this probe FIRST when a benchmark looks
regressed, and record its output next to the bench number.

Prints one JSON line:
  {"queued_ms_per_call": [...], "roundtrip_ms": [...], "backend": ...}
"""
import json
import time

import numpy as np


def main(trials: int = 5, n_queued: int = 20):
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))  # compile + first round-trip

    queued, roundtrip = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        y = None
        for _ in range(n_queued):
            y = f(x)
        np.asarray(y)
        queued.append((time.perf_counter() - t0) / n_queued * 1e3)
        t0 = time.perf_counter()
        np.asarray(f(x))
        roundtrip.append((time.perf_counter() - t0) * 1e3)
        time.sleep(1)

    print(json.dumps({
        "queued_ms_per_call": [round(v, 2) for v in queued],
        "roundtrip_ms": [round(v, 1) for v in roundtrip],
        "backend": jax.default_backend(),
        "device": getattr(jax.devices()[0], "device_kind", "?"),
    }))


if __name__ == "__main__":
    main()
