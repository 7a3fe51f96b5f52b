"""Benchmark: vocoder real-time factor + MFU on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
...}. Primary metric: audio-seconds generated per wall-clock second per chip
through the full HierSpeech++ vocoder ((mel, w2v, f0) -> 16 kHz wav).
Baseline: the BASELINE.md north-star floor of 5x real time per chip.
Extra fields give the honest utilization yardstick: XLA-counted FLOPs per
audio-second, achieved TFLOP/s, and %-of-peak for the chip (MFU), plus the
KV-cached PLM decode rate in tokens/s.
"""
import json
import time

import numpy as np

# bf16 peak TFLOP/s by TPU device kind (public spec sheets); used for MFU
_PEAK_TFLOPS = {
    "v5 lite": 197.0,  # v5e: 197 bf16 TFLOP/s per chip
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,  # v6e (Trillium)
    "v6e": 918.0,
}


def _peak_for(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return None




def _best_of(fn, rounds=6, n_iter=10):
    """Best total wall-time of n_iter queued calls, ended by a full host
    readback of the last result. Over the axon tunnel block_until_ready can
    return before device compute finishes (measured: 1 ms 'sync' calls vs
    586 ms true per-call time at N>=2 queued) — device->host readback is the
    only trustworthy completion barrier. rounds=6 because tunnel latency
    fluctuates in multi-second epochs (tools/probe_tunnel.py measured
    60-100 ms round-trips on 2026-08-20 vs the usual ~10 ms): best-of over
    a ~1 min spread rides out a bad epoch instead of reporting it."""
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _device_watchdog(timeout_s: float = 180.0) -> bool:
    """True if the configured accelerator initializes within timeout.

    Over the axon tunnel a dead relay makes jax.devices() hang forever (no
    error); probing in a subprocess lets us fall back to CPU and still emit
    the JSON line instead of hanging the whole benchmark run."""
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "") in ("", "cpu"):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _device_watchdog():
        # accelerator unreachable: run on host CPU so the benchmark still
        # reports (the JSON carries backend=cpu — not a TPU number)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    # fused-kernel Mosaic compiles run minutes each over the tunnel;
    # persist them so driver/bench reruns start warm
    enable_compile_cache()

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None
    model = HierVocoder(dtype=dtype)

    b, t = 4, 1000  # 80 s of audio per call: compute >> tunnel dispatch noise
    if not on_tpu:
        b, t = 1, 250  # CPU fallback: availability indicator, not a benchmark
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    w2v = jnp.asarray(rng.standard_normal((b, t, 1024)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    f0 = jnp.asarray(np.abs(rng.standard_normal((b, 4 * t, 1))), jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel, w2v, mask, f0)

    @jax.jit
    def synth(params, mel, w2v, mask, f0):
        wav, _ = model.apply({"params": params}, mel, w2v, mask, f0)
        return wav

    params = variables["params"]
    # analytic model FLOPs (utils/flops.py): XLA's cost_analysis over-counts
    # transposed convs ~stride x, so we count the jaxpr ourselves — on a
    # kernels-OFF trace (same math; the counter can't see inside pallas_call,
    # so counting the fused-kernel trace under-bills and inflates no metric
    # but deflates MFU)
    from megatts2_hierspeechpp_tpu.utils.flops import count_flops

    try:
        import os

        _saved = os.environ.get("MEGATTS_PALLAS")
        os.environ["MEGATTS_PALLAS"] = "0"
        try:
            # a fresh UNJITTED callable: tracing the jitted `synth` here
            # would seed pjit's trace cache with the kernels-off body
            flops_per_call = count_flops(
                lambda p, *a: model.apply({"params": p}, *a)[0],
                params, mel, w2v, mask, f0)
        finally:
            if _saved is None:
                os.environ.pop("MEGATTS_PALLAS", None)
            else:
                os.environ["MEGATTS_PALLAS"] = _saved
    except Exception:
        flops_per_call = None
    np.asarray(synth(params, mel, w2v, mask, f0))  # warm dispatch + readback

    n_iter = 10
    best_dt = _best_of(lambda: synth(params, mel, w2v, mask, f0),
                       n_iter=n_iter)

    audio_seconds = b * t / 50.0 * n_iter
    rtf = audio_seconds / best_dt
    baseline = 5.0  # BASELINE.md: >=5x real time per chip

    out = {
        "metric": "vocoder_audio_seconds_per_sec_per_chip",
        "value": round(rtf, 3),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(rtf / baseline, 3),
        "backend": jax.default_backend(),
    }

    # ---- utilization (MFU) ----
    if flops_per_call is not None:
        achieved_tflops = flops_per_call * n_iter / best_dt / 1e12
        out["flops_per_audio_s"] = round(flops_per_call / (b * t / 50.0))
        out["achieved_tflops"] = round(achieved_tflops, 2)
        peak = _peak_for(jax.devices()[0]) if on_tpu else None
        if peak:
            out["peak_tflops"] = peak
            out["mfu_pct"] = round(100.0 * achieved_tflops / peak, 2)

    # ---- SpeechSR-48k throughput (the 48 kHz serving tail) ----
    try:
        from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

        srm = SpeechSR(rate_num=3, rate_den=1, dtype=dtype)
        wav16 = jnp.asarray(
            rng.standard_normal((b, t * 320, 1)) * 0.1, jnp.float32)
        sr_params = jax.jit(srm.init)(jax.random.PRNGKey(2), wav16)
        sr_fn = jax.jit(lambda p, w: srm.apply(p, w))
        np.asarray(sr_fn(sr_params, wav16))
        dt_sr = _best_of(lambda: sr_fn(sr_params, wav16), n_iter=n_iter)
        out["speechsr48_audio_s_per_s"] = round(
            b * t / 50.0 * n_iter / dt_sr, 1)
    except Exception:
        pass

    # ---- KV-cached PLM decode rate (tokens/s) ----
    try:
        from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM, decode

        plm = ProsodyLM()
        t_dec = 500
        tc = jnp.asarray(rng.standard_normal((1, t_dec, 256)), jnp.float32)
        plm_params = jax.jit(plm.init)(
            {"params": jax.random.PRNGKey(1)}, tc,
            jnp.zeros((1, t_dec), jnp.int32), jnp.full((1,), t_dec, jnp.int32),
        )["params"]
        # decode() picks the serving path itself: on TPU the persistent
        # Pallas kernel (default-on), elsewhere the exact f32 scan
        dec = jax.jit(lambda p, a: decode(p, a))
        np.asarray(dec(plm_params, tc))  # compile + warm readback
        # 10 queued calls/round: a 500-token decode is ~20 ms, so per-call
        # dispatch (0.5-10 ms depending on tunnel health) must be amortized
        dt = _best_of(lambda: dec(plm_params, tc), n_iter=10)
        out["plm_decode_tok_s"] = round(t_dec * 10 / dt)
    except Exception:
        pass

    print(json.dumps(out))


if __name__ == "__main__":
    main()
