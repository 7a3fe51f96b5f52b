"""A/B the fused PLM decode step vs the round-2 unfused one (VERDICT r2 #2).

Runs BOTH implementations in ONE process, alternating, with readback
barriers — per CLAUDE.md methodology (per-dispatch tunnel latency makes
separate-process timings incomparable). Shapes mirror B=1 serving: the
duration pre-pass gives out_budget = 2 * t_voc, so T spans the real bucket
grid.

Usage:  python tools/bench_plm_decode.py [--t 400 800 1600 2400] [--iters 5]
        [--cpu]
"""
import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, nargs="+", default=[400, 800, 1600, 2400])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--layers", type=int, default=4)
    args = p.parse_args()

    import os

    # The fused/unfused/fused_bf16 arms must measure the XLA *scan* paths;
    # decode() default-dispatches to the Pallas kernel on TPU, which would
    # turn those arms into Pallas-vs-Pallas self-comparisons (and crash the
    # exactness assert: the bf16 Pallas kernel only ~96-98% agrees with the
    # f32 scan). The kernel is measured by the explicit "pallas" arm below.
    os.environ["MEGATTS_PALLAS_DECODE"] = "0"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from megatts2_hierspeechpp_tpu.models.plm import (
        ProsodyLM, decode, decode_unfused)

    print("backend:", jax.devices()[0].platform, flush=True)
    mod = ProsodyLM(n_layers=args.layers, p_dropout=0.0)
    t_init = 16
    params = jax.jit(mod.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, t_init, 256)),
        jnp.zeros((1, t_init), jnp.int32), jnp.full((1,), t_init, jnp.int32),
    )["params"]

    fns = {
        "fused": jax.jit(lambda p_, tc: decode(p_, tc, n_layers=args.layers)),
        "unfused": jax.jit(
            lambda p_, tc: decode_unfused(p_, tc, n_layers=args.layers)),
        "fused_bf16": jax.jit(
            lambda p_, tc: decode(p_, tc, n_layers=args.layers,
                                  compute_dtype=jnp.bfloat16)),
    }
    if jax.default_backend() == "tpu":
        from megatts2_hierspeechpp_tpu.ops.pallas_plm_decode import (
            plm_decode_greedy,
        )

        fns["pallas"] = jax.jit(
            lambda p_, tc: plm_decode_greedy(p_, tc, n_layers=args.layers))

    results = {}
    for t in args.t:
        tc = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, t, 256)),
            jnp.bfloat16)
        # compile + agree check (np.asarray = the only trustworthy
        # completion barrier over the axon tunnel; see bench.py:_best_of)
        outs = {}
        for name, fn in fns.items():
            outs[name] = np.asarray(fn(params, tc))
        assert (outs["fused"] == outs["unfused"]).all(), "decode mismatch!"
        agree = float((outs["fused"] == outs["fused_bf16"]).mean())
        results[f"bf16_token_agreement_T{t}"] = round(agree, 4)
        if "pallas" in outs:
            results[f"pallas_token_agreement_T{t}"] = round(
                float((outs["fused"] == outs["pallas"]).mean()), 4)

        for name, fn in fns.items():
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(params, tc))
                times.append(time.perf_counter() - t0)
            best = min(times)
            results[f"{name}_T{t}"] = dict(
                s=round(best, 4), tok_s=round(t / best, 1))
            print(f"T={t:5d} {name:10s}: {best*1e3:8.1f} ms "
                  f"({t/best:9.1f} tok/s)", flush=True)
        r = results[f"unfused_T{t}"]["s"] / results[f"fused_T{t}"]["s"]
        rb = results[f"unfused_T{t}"]["s"] / results[f"fused_bf16_T{t}"]["s"]
        results[f"speedup_T{t}"] = round(r, 2)
        results[f"speedup_bf16_T{t}"] = round(rb, 2)
        msg = (f"T={t:5d} speedup: fused {r:.2f}x  bf16 {rb:.2f}x "
               f"(agree {agree:.1%})")
        if "pallas" in fns:
            rp = results[f"unfused_T{t}"]["s"] / results[f"pallas_T{t}"]["s"]
            results[f"speedup_pallas_T{t}"] = round(rp, 2)
            msg += (f"  pallas {rp:.2f}x "
                    f"(agree {results[f'pallas_token_agreement_T{t}']:.1%})")
        print(msg, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
