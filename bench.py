"""Benchmark: vocoder real-time factor on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Metric: audio-seconds generated per wall-clock second per chip through the full
HierSpeech++ vocoder ((mel, w2v, f0) -> 16 kHz wav). Baseline: the BASELINE.md
north-star floor of 5x real time per chip.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    model = HierVocoder(dtype=dtype)

    b, t = 4, 1000  # 80 s of audio per call: compute >> tunnel dispatch noise
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
    wav = synth(params, mel, w2v, mask, f0)
    jax.block_until_ready(wav)  # compile

    # tunnel/host interference makes single rounds noisy: best of 3 rounds
    n_iter = 10
    best_dt = float("inf")
    for _round in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            wav = synth(params, mel, w2v, mask, f0)
        jax.block_until_ready(wav)
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_seconds = b * t / 50.0 * n_iter
    rtf = audio_seconds / best_dt
    baseline = 5.0  # BASELINE.md: >=5x real time per chip
    print(
        json.dumps(
            {
                "metric": "vocoder_audio_seconds_per_sec_per_chip",
                "value": round(rtf, 3),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(rtf / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
