"""A/B the fused AMPBlock-triple stage kernel vs the round-3 per-block fused
path, on hardware, within ONE process (axon tunnel dispatch noise),
readback-barrier timing.

Arms (env is trace-time; each arm jits its own fn):
  fused_amp : MEGATTS_FUSED_AMPBLOCK=1, MEGATTS_FUSED_TRIPLE=0  (r3 default)
  triple    : MEGATTS_FUSED_TRIPLE=1                            (candidate)

Surfaces: full vocoder (B=4 x 20 s) and SpeechSR-48k (B=4 x 20 s), plus
output agreement (SNR dB) between the arms.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_triple.py
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


def snr_db(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    num = np.sum(a ** 2)
    den = np.sum((a - b) ** 2)
    return float(10 * np.log10(num / max(den, 1e-30)))


ARMS = {"fused_amp": "0", "triple": "1"}


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--sr-only", action="store_true",
                    help="skip the vocoder section (3 kernel instances; "
                         "each triple-kernel config compiles in minutes)")
    ap.add_argument("--voc-only", action="store_true")
    args = ap.parse_args()

    enable_compile_cache()  # ~6 big jits; persist across tool invocations
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend()}
    os.environ["MEGATTS_PALLAS"] = "1"
    os.environ["MEGATTS_FUSED_AMPBLOCK"] = "1"

    b, t = 4, 1000

    # ---- full vocoder ----
    if not args.sr_only:
        from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder

        model = HierVocoder(dtype=dtype)
        mel = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
        w2v = jnp.asarray(rng.standard_normal((b, t, 1024)), jnp.float32)
        mask = jnp.ones((b, t, 1), jnp.float32)
        f0 = jnp.asarray(np.abs(rng.standard_normal((b, 4 * t, 1))),
                         jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel, w2v,
                                        mask, f0)
        params = {"params": variables["params"]}

        fns, outs = {}, {}
        for name, flag in ARMS.items():
            os.environ["MEGATTS_FUSED_TRIPLE"] = flag
            fn = jax.jit(lambda p, *a: model.apply(p, *a)[0])
            outs[name] = np.asarray(fn(params, mel, w2v, mask, f0))
            fns[name] = fn
        out["vocoder_agreement_snr_db"] = round(
            snr_db(outs["fused_amp"], outs["triple"]), 1)
        for name, fn in fns.items():
            dt = best_of(lambda: fn(params, mel, w2v, mask, f0))
            out[f"vocoder_audio_s_per_s_{name}"] = round(b * t / 50.0 / dt, 1)
    if args.voc_only:
        print(json.dumps(out))
        return

    # ---- SpeechSR 48k ----
    from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

    srm = SpeechSR(rate_num=3, rate_den=1, dtype=dtype)
    wav16 = jnp.asarray(rng.standard_normal((b, t * 320, 1)) * 0.1,
                        jnp.float32)
    sr_params = jax.jit(srm.init)(jax.random.PRNGKey(1), wav16)
    sr_fns, sr_outs = {}, {}
    for name, flag in ARMS.items():
        os.environ["MEGATTS_FUSED_TRIPLE"] = flag
        fn = jax.jit(lambda p, w: srm.apply(p, w))
        sr_outs[name] = np.asarray(fn(sr_params, wav16))
        sr_fns[name] = fn
    out["speechsr48_agreement_snr_db"] = round(
        snr_db(sr_outs["fused_amp"], sr_outs["triple"]), 1)
    for name, fn in sr_fns.items():
        dt = best_of(lambda: fn(sr_params, wav16))
        out[f"speechsr48_audio_s_per_s_{name}"] = round(b * t / 50.0 / dt, 1)
    os.environ.pop("MEGATTS_FUSED_TRIPLE", None)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
