"""Serving breadth under the *trained* SpeechSR checkpoints (VERDICT r2 #6).

tests/test_real_checkpoint.py proves converter+model parity on the composed
forward; here the SERVING paths — tts_stream (24k AND 48k), per-row-prompt
tts_batch, and the infer_sr CLI — run under the same trained weights
(/root/reference/speechsr{24k,48k}/G_*.pth, the only trained checkpoints
available offline) and must agree with the monolithic path at golden level.
With trained weights the SR stack's true receptive field is exercised, so
these catch halo/edge-alignment bugs random weights can mask.
"""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

import tests.test_pipeline as tp
from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint
from megatts2_hierspeechpp_tpu.models.convert import convert_speechsr
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPTS = {
    24000: ("/root/reference/speechsr24k/G_340000.pth", 3, 2),
    48000: ("/root/reference/speechsr48k/G_100000.pth", 3, 1),
}


@pytest.fixture(scope="module")
def base_pipeline():
    # random TTV/PLM/vocoder (no trained acoustic ckpts exist offline); the
    # SR stage is swapped per test for the real trained model
    return tp.pipeline.__wrapped__()


def _with_real_sr(pipe, output_sr):
    ckpt, num, den = CKPTS[output_sr]
    model = SpeechSR(rate_num=num, rate_den=den)
    params = convert_speechsr(load_torch_checkpoint(ckpt), "dec")
    return dataclasses.replace(
        pipe, speechsr=model, speechsr_params=params, _jits={})


@pytest.mark.slow
@pytest.mark.parametrize("output_sr", [24000, 48000])
def test_tts_stream_trained_sr(base_pipeline, output_sr):
    """Streamed SR chunks under trained weights reproduce the monolithic
    output: gain-matched interior to float accumulation, tail (inside the SR
    receptive field of the bucket padding) bounded. The 24k variant also
    exercises the fractional 3/2 polyphase path end-to-end."""
    pipe = _with_real_sr(base_pipeline, output_sr)
    prompt = (np.random.default_rng(31).uniform(-0.3, 0.3, 32000)
              ).astype(np.float32)
    pf = pipe.prepare_prompt(prompt)
    text = "sil zh ang1 h ao3 n in2 h ao3 sp"
    full = pipe.tts(text, prompt=pf, seed=11, output_sr=output_sr,
                    length_scale=3.0)
    chunks = list(pipe.tts_stream(text, prompt=pf, seed=11, length_scale=3.0,
                                  output_sr=output_sr, chunk_frames=16,
                                  halo_frames=16))
    assert len(chunks) >= 2, "want a multi-chunk stream"
    wav = np.concatenate(chunks)
    assert len(wav) == len(full)
    # exclude SR's receptive field of the TRUE sequence edge (512 samples at
    # 16 kHz x the rate ratio, +margin): there the monolithic path upsamples
    # with vocoder bucket-padding context while the stream is edge-aligned —
    # a legitimate bounded difference, amplified by trained weights
    tail = 2048
    inter_w, inter_f = wav[:-tail], full[:-tail]
    gain = float(np.dot(inter_w, inter_f) / np.dot(inter_w, inter_w))
    err = np.abs(gain * inter_w - inter_f).max()
    # 5e-5 (not the random-weight tests' 1e-5): trained weights have larger
    # dynamic range, so chunked-vs-monolithic fp32 accumulation-order noise
    # grows. Verified diffuse — the max error sits thousands of samples from
    # any piece boundary (a halo shortfall would localize there).
    assert err < 5e-5, err
    # the tail stays the same signal at the same scale (sanity, not golden)
    assert np.abs(gain * wav - full).max() < 0.5


@pytest.mark.slow
def test_tts_batch_trained_sr(base_pipeline):
    """Per-row-prompt batch at 48 kHz under the trained SR ckpt equals each
    row's individual tts() call (noise_scale_vc=0: batched vs single normal
    draws differ by construction)."""
    pipe = _with_real_sr(base_pipeline, 48000)
    rng = np.random.default_rng(33)
    texts = ["sil zh ang1 h ao3 sp", "sil n in2 h ao3 sp"]
    pfs = [pipe.prepare_prompt(
        rng.uniform(-0.3, 0.3, 32000).astype(np.float32)) for _ in texts]
    batch = pipe.tts_batch(texts, prompts=pfs, seed=3, noise_scale_vc=0.0,
                           output_sr=48000)
    for text, pf, w in zip(texts, pfs, batch):
        single = pipe.tts(text, prompt=pf, seed=3, noise_scale_vc=0.0,
                          output_sr=48000)
        assert len(w) == len(single)
        assert np.abs(w - single).max() < 1e-4, np.abs(w - single).max()


_CLI = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import runpy, sys
sys.argv = ["infer_sr"] + sys.argv[1:]
runpy.run_module("megatts2_hierspeechpp_tpu.cli.infer_sr",
                 run_name="__main__")
"""


@pytest.mark.slow
@pytest.mark.parametrize("output_sr", [24000, 48000])
def test_infer_sr_cli_golden(tmp_path, output_sr):
    """The infer_sr CLI end-to-end (load ckpt -> convert -> upsample -> wav
    file) matches the composed SpeechSR forward to int16 quantization on the
    reference demo audio."""
    ckpt, num, den = CKPTS[output_sr]
    src = "/root/reference/example/reference_1.wav"
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    r = subprocess.run(
        [sys.executable, "-c", _CLI, "--input_speech", src, "--ckpt", ckpt,
         "--output_sr", str(output_sr), "--output_dir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    out_path = r.stdout.strip().splitlines()[-1]
    sr_out, wav_cli = wavfile.read(out_path)
    assert sr_out == output_sr

    sr_in, raw = wavfile.read(src)
    audio = raw.astype(np.float32) / 32768.0
    model = SpeechSR(rate_num=num, rate_den=den)
    params = {"params": convert_speechsr(load_torch_checkpoint(ckpt), "dec")}
    up = np.asarray(model.apply(params, jnp.asarray(audio)[None, :, None]))[0, :, 0]
    up = up / max(np.abs(up).max(), 1e-8) * 0.999

    got = wav_cli.astype(np.float32) / 32767.0
    assert got.shape == up.shape
    assert np.abs(got - up).max() <= 1.5 / 32767.0
