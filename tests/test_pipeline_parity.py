"""Composed-pipeline numerical parity: our TTSPipeline vs the reference's
ACTUAL tts()/VC() compositions (/root/reference/inference_plm.py:103-201,
inference_vc.py:70-172), executed verbatim on CPU with shared random weights
through the converters.

Stage oracles can't catch wiring bugs (prompt pad-to-1600 order, mel
off-by-one, denoise interpolation, length plumbing, pitch clipping); this
suite runs the reference scripts' own composition functions and compares
intermediates + final wavs.

The one deliberate decode deviation is preserved: the reference's PLM
`infer` forgot the causal mask it trained with (t2w2v_transformer.py:702-718
calls self.plm(x_pos) without causal=True), so greedy codes differ by design.
The composed tests therefore inject the reference's own codes into our
pipeline (`codes=` argument), proving every other stage's composition; the
causal KV-decode itself is oracle-tested in test_plm.py.
"""
import os
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.infer.pipeline import TTSPipeline
from megatts2_hierspeechpp_tpu.models.convert import (
    convert_denoiser,
    convert_plm,
    convert_ttv,
    convert_vocoder,
)
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.models.denoiser import MPNet

torch_ref.add_reference_path()
torch_ref.patch_cuda_noop()

TEXT = "sil zh ang1 h ao3 sp"

VOC_SMALL = dict(  # structurally-true small vocoder (test_vocoder.py config)
    spec_channels=33,
    segment_size=32,
    inter_channels=192,
    hidden_channels=48,
    filter_channels=96,
    n_heads=2,
    n_layers=6,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=[3, 7, 11],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    upsample_rates=[4, 5, 4, 2, 2],
    upsample_initial_channel=64,
    upsample_kernel_sizes=[8, 11, 8, 4, 4],
    gin_channels=256,
)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Reference torch modules (random weights) + the converted jax pipeline +
    a 16 kHz prompt wav on disk (so the reference's torchaudio.load path and
    our float path read identical samples)."""
    from ttv_v1.t2w2v_transformer import Megatts2PLM1, SynthesizerTrn as RefTTV
    import hierspeechpp_speechsynthesizer as ref_voc
    from Mels_preprocess import MelSpectrogramFixed

    torch.manual_seed(0)
    ttv_t = RefTTV(
        n_vocab=text_frontend.N_VOCAB,
        n_tone=text_frontend.N_TONE,
        n_language=text_frontend.N_LANGUAGE,
        spec_channels=641,
        hop_length=320,
        sampling_rate=16000,
        segment_size=32,
        inter_channels=256,
        hidden_channels=256,
        filter_channels=1024,
        n_heads=4,
        n_layers=6,
        kernel_size=3,
        p_dropout=0.0,
        resblock="1",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    ).eval()
    with torch.no_grad():
        cb = ttv_t.quantizer.vq.layers[0]._codebook
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed)
        cb.cluster_size.fill_(10.0)
        cb.inited.fill_(1)

    plm_t = Megatts2PLM1().eval()
    voc_t = ref_voc.SynthesizerTrn(**VOC_SMALL).eval()
    with torch.no_grad():  # randomize zero-init snake params for a stronger test
        for name, pt in voc_t.named_parameters():
            if name.endswith(".alpha") or name.endswith(".beta"):
                pt.normal_(0, 0.2)

    mel_fn = MelSpectrogramFixed(
        sample_rate=16000, n_fft=1280, win_length=1280, hop_length=320,
        f_min=0, f_max=8000, n_mels=80, window_fn=torch.hann_window,
    )

    pipe = TTSPipeline(
        ttv=TTVModel(n_vocab=text_frontend.N_VOCAB, n_tone=text_frontend.N_TONE,
                     n_language=text_frontend.N_LANGUAGE),
        ttv_vars=convert_ttv(ttv_t.state_dict()),
        plm=ProsodyLM(),
        plm_params=convert_plm(plm_t.state_dict()),
        vocoder=HierVocoder(
            spec_channels=VOC_SMALL["spec_channels"],
            inter_channels=VOC_SMALL["inter_channels"],
            hidden_channels=VOC_SMALL["hidden_channels"],
            filter_channels=VOC_SMALL["filter_channels"],
            upsample_rates=VOC_SMALL["upsample_rates"],
            upsample_initial_channel=VOC_SMALL["upsample_initial_channel"],
            upsample_kernel_sizes=VOC_SMALL["upsample_kernel_sizes"],
            gin_channels=VOC_SMALL["gin_channels"],
        ),
        vocoder_params={"params": convert_vocoder(voc_t.state_dict())},
    )

    # 16 kHz prompt wav, length deliberately NOT a 1600-multiple
    tmp = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(7)
    wav_i16 = (rng.uniform(-0.3, 0.3, 15900) * 32767).astype(np.int16)
    prompt_path = str(tmp / "prompt.wav")
    from scipy.io import wavfile

    wavfile.write(prompt_path, 16000, wav_i16)
    prompt_f32 = wav_i16.astype(np.float32) / 32768.0

    return SimpleNamespace(
        ttv_t=ttv_t, plm_t=plm_t, voc_t=voc_t, mel_fn=mel_fn, pipe=pipe,
        prompt_path=prompt_path, prompt_f32=prompt_f32, tmp=tmp,
    )


def _run_reference_tts(world, out_dir, denoise_ratio=0.0, denoiser=None,
                       hps_denoiser=None):
    """Execute the reference inference_plm.tts() verbatim, capturing the PLM
    codes and the vocoder inputs along the way. Returns (wav, captured)."""
    import inference_plm

    inference_plm.device = torch.device("cpu")
    if hps_denoiser is not None:
        inference_plm.hps_denoiser = hps_denoiser

    cap = {}
    plm = world.plm_t
    orig_infer = plm.infer

    def infer_capture(tc_latent):
        cap["x_frame"] = tc_latent.detach().clone()
        codes = orig_infer(tc_latent)
        cap["codes"] = codes.detach().clone()
        return codes

    plm.infer = infer_capture
    net_g = world.voc_t
    orig_vc = net_g.voice_conversion_noise_control

    def vc_capture(w2v, x_length, mel, length2, f0, **kw):
        cap["w2v"] = w2v.detach().clone()
        cap["f0"] = f0.detach().clone()
        return orig_vc(w2v, x_length, mel, length2, f0, **kw)

    net_g.voice_conversion_noise_control = vc_capture
    a = SimpleNamespace(
        output_dir=str(out_dir), scale_norm="max", noise_scale_vc=0.0,
        denoise_ratio=denoise_ratio, output_sr=16000,
    )
    hier = (net_g, world.ttv_t, None, denoiser, world.mel_fn, plm)
    try:
        with torch.no_grad():
            inference_plm.tts(TEXT, a, hier, prompt_path=world.prompt_path,
                              speaker_name="spk", item_count=1)
    finally:
        plm.infer = orig_infer
        net_g.voice_conversion_noise_control = orig_vc

    from scipy.io import wavfile

    sr, data = wavfile.read(os.path.join(str(out_dir), "spk", "audio", "001.wav"))
    assert sr == 16000
    return data.astype(np.float32) / 32767.0, cap


def _report(name, ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
    d = np.abs(ours - ref)
    rel = np.linalg.norm(d) / max(np.linalg.norm(ref), 1e-12)
    print(f"{name}: max={d.max():.3e} mean={d.mean():.3e} "
          f"q99={np.quantile(d, 0.99):.3e} relL2={rel:.3e}")
    return d, rel


@pytest.mark.slow
def test_tts_composed_parity(world):
    """Full composed TTS path vs reference tts(): text frontend -> prompt
    prep -> TTV latent -> (injected reference codes) -> w2v/f0 -> pitch clip
    -> vocoder VC -> peak norm. noise_scale_vc=0 for determinism."""
    ref_wav, cap = _run_reference_tts(world, world.tmp / "ref0")

    ours_wav, inter = world.pipe.tts(
        TEXT, world.prompt_f32, noise_scale_vc=0.0, output_sr=16000,
        exact=True, codes=cap["codes"].numpy(), return_intermediates=True,
    )

    # stage-level agreement first (diagnosable), then the wav
    t = inter["frame_lengths"]
    assert cap["x_frame"].shape[-1] == t, (cap["x_frame"].shape, t)
    d, rel = _report("x_frame", inter["x_frame"][0],
                     cap["x_frame"][0].numpy().T)
    assert rel < 1e-3 and d.max() < 2e-2

    d, rel = _report("w2v", inter["w2v"][0], cap["w2v"][0].numpy().T)
    assert rel < 1e-2 and np.quantile(d, 0.99) < 2e-2

    d, rel = _report("lf0", inter["lf0"][0], cap["f0"][0].numpy().reshape(-1))
    assert d.max() < 5e-2

    assert len(ours_wav) == len(ref_wav), (len(ours_wav), len(ref_wav))
    d, rel = _report("wav", ours_wav, ref_wav)
    corr = np.corrcoef(ours_wav, ref_wav)[0, 1]
    print(f"wav corr={corr:.6f}")
    assert corr > 0.999
    assert rel < 5e-2


@pytest.mark.slow
def test_tts_composed_parity_denoise(world):
    """denoise_ratio=0.8 path: MP-SENet denoise of the padded prompt + style
    interpolation between [orig; denoised] mels (inference_plm.py:141-156)."""
    from denoiser.generator import MPNet as RefMPNet
    from megatts2_hierspeechpp_tpu.utils.config import HParams

    h = HParams(
        dense_channel=16, compress_factor=0.3, num_tsconformers=2, beta=2.0,
        sampling_rate=16000, segment_size=32000, n_fft=400, hop_size=100,
        win_size=400,
    )
    torch.manual_seed(3)
    den_t = RefMPNet(h, num_tscblocks=2).eval()

    world.pipe.denoiser = MPNet(dense_channel=16, num_tsblocks=2, n_freqs=201)
    world.pipe.denoiser_vars = convert_denoiser(den_t.state_dict(), num_tsblocks=2)
    try:
        ref_wav, cap = _run_reference_tts(
            world, world.tmp / "ref_dn", denoise_ratio=0.8, denoiser=den_t,
            hps_denoiser=h,
        )
        ours_wav, inter = world.pipe.tts(
            TEXT, world.prompt_f32, noise_scale_vc=0.0, denoise_ratio=0.8,
            output_sr=16000, exact=True, codes=cap["codes"].numpy(),
            return_intermediates=True,
        )
    finally:
        world.pipe.denoiser = None
        world.pipe.denoiser_vars = None

    assert len(ours_wav) == len(ref_wav)
    d, rel = _report("wav(denoise)", ours_wav, ref_wav)
    corr = np.corrcoef(ours_wav, ref_wav)[0, 1]
    print(f"wav corr={corr:.6f}")
    assert corr > 0.999
    assert rel < 5e-2
