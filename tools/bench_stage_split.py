"""Per-stage split of the Generator resblock work (round-4 fusion decision).

`tools/bench_voc_profile.py --dec-split` showed the five transposed convs
total ~20 ms of the 195 ms `dec` stage — the rest is the per-stage resblock
work (3 AMPBlocks + avg [+ tail]). This tool times EACH stage's resblock
computation standalone at the exact shapes the B=4 x 20 s headline bench
uses, alongside an analytic roofline per stage:

  - conv GFLOPs (the 18 dilated convs: 3 blocks x 3 dilations x 2 convs,
    total taps 6*(3+7+11)=126 -> 2 * 126 * C^2 * B * T)
  - the MXU *shape-imposed* ceiling: a (C, C) @ (C, W) tap-dot fills the
    128x128 systolic array at (C/128)^2 -> ideal conv ms at that ceiling
  - VPU snake op volume (19 anti-aliased snakes/stage: ~24 polyphase MACs
    + 1 sin per element each)

so the table answers "is stage s at its hardware ceiling, or is there
headroom a better kernel could claim?" — VERDICT r2 #5's roofline branch.

Stage dispatch mirrors models/vocoder.Generator exactly: C=256 runs the
composed XLA path (per-block fusion is gated C<=128 by VMEM weight
residency), C=128 the per-block fused kernel, C<=64 the whole-stage triple
kernel (tail AA-snake + conv_post + tanh fused on the last stage).

Reference hot loop: /root/reference/hierspeechpp_speechsynthesizer.py
Generator.forward (upsample/AMP stack).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_stage_split.py
       [--cpu] [--iters 5] [--b 4 --t 1000]
NOTE: fresh Mosaic compiles for the standalone stage executables take
minutes (CLAUDE.md triple-compile gotcha) — run under `timeout 3000`;
the persistent cache makes reruns cheap.
"""
import argparse
import json

import numpy as np


def _timed(fn, a, n_iter=8):
    import time

    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(n_iter):
        out = fn(*a)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / n_iter


MXU_PEAK_TFLOPS = 197.0  # v5e bf16 (utils/flops.py)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--t", type=int, default=1000)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.nn.conv import Conv1d
    from megatts2_hierspeechpp_tpu.nn.resblocks import (
        AASnakeBeta,
        AMPBlock,
        fused_triple_enabled,
    )
    from megatts2_hierspeechpp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None

    KS = (3, 7, 11)
    DILS = ((1, 3, 5),) * 3
    RATES = (4, 5, 4, 2, 2)
    UIC = 512

    class Stage(nn.Module):
        """One Generator stage's resblock work, same dispatch as the model."""

        ch: int
        last: bool = False

        @nn.compact
        def __call__(self, y):
            blocks = [
                AMPBlock(self.ch, rk, rd, dtype=dtype, name=f"resblocks_{j}")
                for j, (rk, rd) in enumerate(zip(KS, DILS))
            ]
            if self.last:
                act_post = AASnakeBeta(self.ch, alpha_logscale=True,
                                       name="activation_post")
                conv_post = Conv1d(1, 7, padding=3, use_bias=False,
                                   dtype=dtype, name="conv_post")
            if fused_triple_enabled(self.ch):
                from megatts2_hierspeechpp_tpu.ops.pallas_amp_triple import (
                    fused_amp_triple,
                )

                bws = [blk(y, return_weights=True) for blk in blocks]
                if self.last:
                    pa, pb = act_post(y, return_params=True)
                    pk, _ = conv_post(y, return_kernel=True)
                    return fused_amp_triple(
                        y, bws, KS, DILS,
                        post=(pa, 1.0 / (pb + 1e-9), pk[:, :, 0]))
                return fused_amp_triple(y, bws, KS, DILS)
            xs = None
            for blk in blocks:
                r = blk(y)
                xs = r if xs is None else xs + r
            y = xs / len(KS)
            if self.last:
                y = jnp.tanh(conv_post(act_post(y)))
            return y

    b, t = args.b, args.t
    rng = np.random.default_rng(0)
    rows = []
    t_i = t
    for i, u in enumerate(RATES):
        t_i *= u
        ch = UIC // 2 ** (i + 1)
        last = i == len(RATES) - 1
        # the real Generator feeds each stage bf16 activations on TPU (module
        # dtype) — an f32 input doubles the fused kernels' VMEM tiles and
        # OOMs the C=128 per-block instance at tile 2048
        x = jnp.asarray(rng.standard_normal((b, t_i, ch)) * 0.3,
                        jnp.bfloat16 if on_tpu else jnp.float32)
        mod = Stage(ch, last)
        params = jax.jit(mod.init)(jax.random.PRNGKey(i), x)

        def fn(v, xx, m=mod):
            out = m.apply(v, xx)
            return jnp.sum(out.astype(jnp.float32))

        jfn = jax.jit(fn)
        np.asarray(jfn(params, x))  # warm/compile
        best = float("inf")
        for _ in range(args.iters):
            best = min(best, _timed(jfn, (params, x)))

        # analytic roofline pieces
        n_elem = b * t_i * ch
        # 18 convs/stage: per block(k) 3 dil x 2 convs x k taps = 6k,
        # summed over blocks -> 6*(3+7+11) = 126 taps total
        conv_flops = 2 * sum(6 * k for k in KS) * ch * ch * b * t_i
        util = min(ch / 128.0, 1.0) ** 2
        ideal_conv_ms = conv_flops / (MXU_PEAK_TFLOPS * 1e12 * util) * 1e3
        n_snakes = 18 + (1 if last else 0)
        vpu_macs = n_elem * n_snakes * 24  # polyphase up+down FIR MACs
        vpu_sins = n_elem * n_snakes       # 1 sin / output element
        rows.append(dict(stage=i, ch=ch, t=t_i, ms=best * 1e3,
                         conv_gflops=conv_flops / 1e9, mxu_util_cap=util,
                         ideal_conv_ms=ideal_conv_ms,
                         vpu_gmacs=vpu_macs / 1e9, vpu_gsins=vpu_sins / 1e9))
        print(f"stage {i} C={ch} T={t_i}: {best * 1e3:.2f} ms "
              f"(ideal conv at shape-cap {ideal_conv_ms:.2f} ms)", flush=True)

    audio_s = b * t * 320 / 16000
    total = sum(r["ms"] for r in rows)
    hdr = (f"{'stage':>6s} {'C':>4s} {'T':>7s} {'ms':>8s} {'%':>6s} "
           f"{'convGF':>7s} {'cap':>6s} {'idealms':>8s} {'x-ceil':>7s} "
           f"{'vpuGMAC':>8s}")
    print(f"backend: {jax.devices()[0].platform} B={b} T={t} "
          f"({audio_s:.0f} audio-s/call)")
    print(hdr)
    for r in rows:
        print(f"{r['stage']:>6d} {r['ch']:>4d} {r['t']:>7d} {r['ms']:>8.2f} "
              f"{100 * r['ms'] / total:>5.1f}% {r['conv_gflops']:>7.1f} "
              f"{r['mxu_util_cap']:>6.3f} {r['ideal_conv_ms']:>8.2f} "
              f"{r['ms'] / r['ideal_conv_ms']:>7.2f} {r['vpu_gmacs']:>8.1f}",
              flush=True)
    print(f"{'sum':>6s} {'':>4s} {'':>7s} {total:>8.2f}")
    out = dict(backend=jax.devices()[0].platform, b=b, t=t,
               stage_sum_ms=round(total, 2), stages=rows)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
