"""Per-stage vocoder profile (VERDICT r2 next-round #1d / #5).

Splits the inference forward (HierVocoder.__call__: style -> enc_p_l ->
flows -> source network -> Generator decode [-> SpeechSR]) into separately
jitted stages fed by precomputed on-device intermediates, and times each with
readback barriers, alternating across stages within ONE process (per
CLAUDE.md methodology — per-dispatch tunnel latency makes separate runs
incomparable). The stage sum is cross-checked against the fused full forward
so dispatch overhead can't masquerade as compute.

Shapes mirror bench.py (B=4, T=1000 : 80 s of audio/call) so the fractions
directly explain the headline vocoder_audio_seconds_per_sec_per_chip number.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_voc_profile.py
       [--cpu] [--iters 5] [--b 4 --t 1000]
       [--sr]   # also profile the 48k SpeechSR stage (CPU finding: SpeechSR
                # alone costs ~1.8x the WHOLE vocoder — it convolves at 48 kHz
                # sample rate; candidate for the next fusion/kernel round)
Prints a table + one JSON line.

Reference hot loop being profiled: the upsample/AMP stack of
hierspeechpp_speechsynthesizer.py:394-461.
"""
import argparse
import json
import time

import numpy as np


def _timed(fn, a, n_iter=8):
    """Wall time of n_iter queued calls ended by a full host readback of the
    last result, amortized per call. Over the axon tunnel
    jax.block_until_ready can return before device compute finishes
    (bench.py:_best_of); the stage fns sum-reduce their outputs inside the
    jit so the readback is 8 bytes and can't contaminate the timing."""
    import time

    import jax
    import numpy as np

    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn(*a)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / n_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--t", type=int, default=1000)
    p.add_argument("--sr", action="store_true", help="profile SpeechSR too")
    p.add_argument("--dec-split", action="store_true",
                   help="also time each Generator transposed-conv upsampler "
                        "standalone (XLA-only jits) — attributes the dec "
                        "stage between ups_i and the fused resblock stages")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    # ~12 executables, several containing multi-minute Mosaic kernel
    # compiles — persist them so reruns (and partial timeouts) are cheap
    enable_compile_cache()

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None
    print(f"backend: {jax.devices()[0].platform} dtype: {dtype} "
          f"B={args.b} T={args.t}", flush=True)

    model = HierVocoder(dtype=dtype)
    b, t = args.b, args.t
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    w2v = jnp.asarray(rng.standard_normal((b, t, 1024)), jnp.float32)
    mask = jnp.ones((b, t, 1), jnp.float32)
    f0 = jnp.asarray(np.abs(rng.standard_normal((b, 4 * t, 1))), jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel, w2v, mask, f0)
    params = {"params": variables["params"]}

    # ---- stage functions (deterministic: rng=None -> z = m_p) ----
    def _style(v, mel, mask):
        return model.apply(v, mel, mask,
                           method=lambda m, a, b_: m.emb_g(a, b_))

    def _enc(v, w2v, f0, mask, g):
        z, m_, s_ = model.apply(
            v, w2v, f0, mask, g, None, False,
            method=lambda m, *a: m.enc_p_l(*a))
        return z

    def _flows(v, z, mask, g):
        z = model.apply(v, z, mask, g, True,
                        method=lambda m, *a: m.flow_l(*a[:3], reverse=a[3]))
        return model.apply(v, z, mask, g, True,
                           method=lambda m, *a: m.flow(*a[:3], reverse=a[3]))

    def _sn(v, z, g):
        return model.apply(v, z, g, method=lambda m, *a: m.sn(*a))

    def _dec(v, z, e, g):
        return model.apply(v, z, e, g, method=lambda m, *a: m.decode_latent(*a))

    def _full(v, mel, w2v, mask, f0):
        wav, _ = model.apply(v, mel, w2v, mask, f0)
        return wav

    def _scalarize(fn):
        """Sum-reduce the output inside the jit: full compute is still
        required, but the host readback barrier transfers 8 bytes instead of
        megabytes of waveform (which would contaminate per-stage timing)."""
        def wrapped(*a):
            out = fn(*a)
            return jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
                out, jnp.float32(0.0))
        return wrapped

    stages = {}
    g = jax.block_until_ready(jax.jit(_style)(params, mel, mask))
    z = jax.block_until_ready(jax.jit(_enc)(params, w2v, f0, mask, g))
    zf = jax.block_until_ready(jax.jit(_flows)(params, z, mask, g))
    e, _e2 = jax.jit(_sn)(params, zf, g)
    e = jax.block_until_ready(e)

    fns = {
        "style": (jax.jit(_scalarize(_style)), (params, mel, mask)),
        "enc_p_l": (jax.jit(_scalarize(_enc)), (params, w2v, f0, mask, g)),
        "flows": (jax.jit(_scalarize(_flows)), (params, z, mask, g)),
        "source_net": (jax.jit(_scalarize(_sn)), (params, zf, g)),
        "dec": (jax.jit(_scalarize(_dec)), (params, zf, e, g)),
        "full": (jax.jit(_scalarize(_full)), (params, mel, w2v, mask, f0)),
    }
    dec_ups = []
    if args.dec_split:
        from megatts2_hierspeechpp_tpu.nn.conv import WNConvTranspose1d

        gp = variables["params"]["dec"]
        uic, rates, kss = 512, (4, 5, 4, 2, 2), (8, 11, 8, 4, 4)
        t_i, ch_in = t, uic
        for i, (u, k) in enumerate(zip(rates, kss)):
            ch = uic // 2 ** (i + 1)
            x_i = jnp.asarray(
                rng.standard_normal((b, t_i, ch_in)) * 0.3, jnp.float32)
            mod = WNConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2,
                                    dtype=dtype)
            name = f"dec_ups_{i}"
            fns[name] = (
                jax.jit(_scalarize(lambda v, x, m=mod: m.apply(v, x))),
                ({"params": gp[f"ups_{i}"]}, x_i))
            dec_ups.append(name)
            t_i *= u
            ch_in = ch

    if args.sr:
        from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

        srm = SpeechSR(rate_num=3, rate_den=1, dtype=dtype)
        wav0 = np.asarray(jax.jit(_full)(params, mel, w2v, mask, f0))
        wav0 = jnp.asarray(wav0)
        sr_params = jax.jit(srm.init)(jax.random.PRNGKey(1), wav0)
        fns["speechsr_48k"] = (
            jax.jit(_scalarize(lambda v, w: srm.apply(v, w))),
            (sr_params, wav0))

    # warm every executable (readback = true completion barrier), then
    # alternate stages per round within this one process
    for name, (fn, a) in fns.items():
        np.asarray(fn(*a))
    best = {k: float("inf") for k in fns}
    for _ in range(args.iters):
        for name, (fn, a) in fns.items():
            best[name] = min(best[name], _timed(fn, a))

    audio_s = b * t * 320 / 16000
    stage_keys = ["style", "enc_p_l", "flows", "source_net", "dec"]
    total = sum(best[k] for k in stage_keys)
    print(f"\n{'stage':>12s} {'ms':>9s} {'% of sum':>9s} {'audio-s/s':>10s}")
    for k in stage_keys + dec_ups + (["speechsr_48k"] if args.sr else []):
        pct = 100 * best[k] / total if k in stage_keys else float("nan")
        print(f"{k:>12s} {best[k]*1e3:9.2f} {pct:9.1f} "
              f"{audio_s/best[k]:10.1f}", flush=True)
    print(f"{'sum':>12s} {total*1e3:9.2f} {100.0:9.1f} {audio_s/total:10.1f}")
    print(f"{'full(fused)':>12s} {best['full']*1e3:9.2f} "
          f"{'':>9s} {audio_s/best['full']:10.1f}")

    out = {f"{k}_ms": round(v * 1e3, 3) for k, v in best.items()}
    out.update(backend=jax.devices()[0].platform, b=b, t=t,
               stage_sum_ms=round(total * 1e3, 3),
               full_audio_s_per_s=round(audio_s / best["full"], 2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
