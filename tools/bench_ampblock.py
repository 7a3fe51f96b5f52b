"""A/B the fused whole-AMPBlock kernel vs the composed path on hardware.

Within ONE process (axon tunnel dispatch noise), readback-barrier timing:
 1. per-stage AMPBlock at the Generator's (C, rate) combos
 2. full vocoder voice_conversion with MEGATTS_FUSED_AMPBLOCK on/off

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_ampblock.py
"""
import json
import os
import time

import numpy as np


def best_of(fn, rounds=3, n_iter=10):
    import jax

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.nn.resblocks import AMPBlock

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-only", action="store_true",
                    help="skip the per-stage block section (fewer compiles)")
    ap.add_argument("--blocks-only", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None
    rng = np.random.default_rng(0)
    out = {}

    # ---- per-stage blocks: Generator C/rate ladder for 80 s of audio ----
    for c, t in ([] if args.model_only
                 else [(64, 4000 * 80), (32, 8000 * 80), (16, 16000 * 80)]):
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        block = AMPBlock(c, 11, (1, 3, 5), dtype=dtype)
        params = jax.jit(block.init)(jax.random.PRNGKey(0), x[:, :512])

        times = {}
        for flag in ("0", "1"):
            os.environ["MEGATTS_FUSED_AMPBLOCK"] = flag
            fn = jax.jit(lambda p, x: block.apply(p, x))
            np.asarray(fn(params, x))  # compile+warm (env is trace-time)
            times[flag] = best_of(lambda: fn(params, x))
        out[f"ampblock_c{c}_ms_composed"] = round(times["0"] * 1e3, 3)
        out[f"ampblock_c{c}_ms_fused"] = round(times["1"] * 1e3, 3)
        out[f"ampblock_c{c}_speedup"] = round(times["0"] / times["1"], 2)

    # ---- model level: full vocoder, three kernel arms ----
    # xla        : MEGATTS_PALLAS=0 (no custom kernels at all)
    # snake      : AA-snake Pallas kernel only (the shipped default)
    # fused_amp  : + whole-AMPBlock fusion (the opt-in candidate)
    if not args.blocks_only:
        from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder

        model = HierVocoder(dtype=dtype)
        b, t = 4, 1000
        mel = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
        w2v = jnp.asarray(rng.standard_normal((b, t, 1024)), jnp.float32)
        mask = jnp.ones((b, t, 1), jnp.float32)
        f0 = jnp.asarray(np.abs(rng.standard_normal((b, 4 * t, 1))),
                         jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel, w2v,
                                        mask, f0)
        params = {"params": variables["params"]}

        arms = {"xla": ("0", "0"), "snake": ("1", "0"), "fused_amp": ("1", "1")}
        fns = {}
        for name, (pallas, fused) in arms.items():
            os.environ["MEGATTS_PALLAS"] = pallas
            os.environ["MEGATTS_FUSED_AMPBLOCK"] = fused
            fn = jax.jit(lambda p, *a: model.apply(p, *a)[0])
            np.asarray(fn(params, mel, w2v, mask, f0))  # env is trace-time
            fns[name] = fn
        os.environ.pop("MEGATTS_PALLAS", None)
        # alternate arms across rounds within this one process
        for name, fn in fns.items():
            dt = best_of(lambda: fn(params, mel, w2v, mask, f0))
            out[f"vocoder_audio_s_per_s_{name}"] = round(b * t / 50.0 / dt, 1)

        # ---- SpeechSR 48k (the profile's biggest stage: C=16 convs at
        # 48 kHz — 403 ms vs 215 ms for the WHOLE vocoder): same three arms
        from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

        srm = SpeechSR(rate_num=3, rate_den=1, dtype=dtype)
        wav16 = jnp.asarray(
            rng.standard_normal((b, t * 320, 1)) * 0.1, jnp.float32)
        sr_params = jax.jit(srm.init)(jax.random.PRNGKey(1), wav16)
        sr_fns = {}
        for name, (pallas, fused) in arms.items():
            os.environ["MEGATTS_PALLAS"] = pallas
            os.environ["MEGATTS_FUSED_AMPBLOCK"] = fused
            fn = jax.jit(lambda p, w: srm.apply(p, w))
            np.asarray(fn(sr_params, wav16))
            sr_fns[name] = fn
        os.environ.pop("MEGATTS_PALLAS", None)
        for name, fn in sr_fns.items():
            dt = best_of(lambda: fn(sr_params, wav16))
            out[f"speechsr48_audio_s_per_s_{name}"] = round(b * t / 50.0 / dt, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
