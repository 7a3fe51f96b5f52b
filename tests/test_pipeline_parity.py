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

    # VC source wav: different content + length (also not a 1280-multiple)
    src_i16 = (np.sin(2 * np.pi * 140.0 * np.arange(14321) / 16000.0) * 0.25
               * 32767 + rng.uniform(-0.05, 0.05, 14321) * 32767
               ).astype(np.int16)
    src_path = str(tmp / "source.wav")
    wavfile.write(src_path, 16000, src_i16)
    src_f32 = src_i16.astype(np.float32) / 32768.0

    return SimpleNamespace(
        ttv_t=ttv_t, plm_t=plm_t, voc_t=voc_t, mel_fn=mel_fn, pipe=pipe,
        prompt_path=prompt_path, prompt_f32=prompt_f32, tmp=tmp,
        src_path=src_path, src_f32=src_f32,
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


def _make_denoiser():
    """Small-but-structural MP-SENet pair (reference torch + converted jax)."""
    from denoiser.generator import MPNet as RefMPNet
    from megatts2_hierspeechpp_tpu.utils.config import HParams

    h = HParams(
        dense_channel=16, compress_factor=0.3, num_tsconformers=2, beta=2.0,
        sampling_rate=16000, segment_size=32000, n_fft=400, hop_size=100,
        win_size=400,
    )
    torch.manual_seed(3)
    den_t = RefMPNet(h, num_tscblocks=2).eval()
    return h, den_t


@pytest.mark.slow
def test_tts_composed_parity_denoise(world):
    """denoise_ratio=0.8 path: MP-SENet denoise of the padded prompt + style
    interpolation between [orig; denoised] mels (inference_plm.py:141-156)."""
    h, den_t = _make_denoiser()

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


# ---------------------------------------------------------------- VC parity

def _fake_yaapt_f0(audio, rate=16000, interp=False):
    """Deterministic stand-in for the reference get_yaapt_f0
    (inference_vc.py:28-43): same framing contract (200 Hz = hop 80,
    (B, 1, T//80), 0 = unvoiced), content-dependent so source/target
    distributions differ and the speaker-stat transfer math is exercised."""
    out = []
    for y in np.asarray(audio, np.float64):
        y = y.reshape(-1)
        t = y.shape[0] // 80
        base = 120.0 + 300.0 * min(float(np.abs(y).mean()), 0.5)
        ph = np.arange(t, dtype=np.float64)
        f = base + 35.0 * np.sin(2 * np.pi * ph / 31.0)
        voiced = (ph % 17) != 0
        out.append((f * voiced)[None, None, :])
    return np.vstack(out)


@pytest.fixture(scope="module")
def w2v_pair():
    """Small-but-1024-wide wav2vec2 (the vocoder's w2v input is fixed at
    1024ch, hierspeechpp_speechsynthesizer.py:608) + our converted model."""
    from transformers import Wav2Vec2Config, Wav2Vec2ForPreTraining
    from megatts2_hierspeechpp_tpu.models.wav2vec2 import Wav2Vec2
    from megatts2_hierspeechpp_tpu.models.convert import convert_wav2vec2

    cfg = Wav2Vec2Config(
        hidden_size=1024, num_hidden_layers=8, num_attention_heads=8,
        intermediate_size=256, conv_dim=[32] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, codevector_dim=32, proj_codevector_dim=32,
    )
    torch.manual_seed(11)
    w2v_t = Wav2Vec2ForPreTraining(cfg).eval()
    w2v_j = Wav2Vec2(hidden_size=1024, n_heads=8, ffn_dim=256,
                     output_layer=7, conv_dim=(32,) * 7)
    return w2v_t, w2v_j, convert_wav2vec2(w2v_t.state_dict(), output_layer=7)


def _run_reference_vc(world, w2v_t, out_dir, denoise_ratio=0.0, denoiser=None,
                      hps_denoiser=None):
    """Execute the reference inference_vc.VC() verbatim on CPU with the
    deterministic f0 stub, capturing the vocoder inputs."""
    import inference_vc
    from hierspeechpp_speechsynthesizer import Wav2vec2 as RefW2V

    inference_vc.device = torch.device("cpu")
    inference_vc.get_yaapt_f0 = _fake_yaapt_f0
    if hps_denoiser is not None:
        inference_vc.hps_denoiser = hps_denoiser

    # reference wrapper forward without its from_pretrained __init__
    ref_w2v = RefW2V.__new__(RefW2V)
    torch.nn.Module.__init__(ref_w2v)
    ref_w2v.wav2vec2 = w2v_t
    ref_w2v.feature_layer = 7

    cap = {}
    net_g = world.voc_t
    orig_vc = net_g.voice_conversion_noise_control

    def vc_capture(w2v, x_length, mel, length2, f0, **kw):
        cap["w2v"] = w2v.detach().clone()
        cap["f0"] = f0.detach().clone()
        return orig_vc(w2v, x_length, mel, length2, f0, **kw)

    net_g.voice_conversion_noise_control = vc_capture
    a = SimpleNamespace(
        source_speech=world.src_path, target_speech=world.prompt_path,
        output_dir=str(out_dir), scale_norm="max", noise_scale_vc=0.0,
        denoise_ratio=denoise_ratio, output_sr=16000,
    )
    try:
        with torch.no_grad():
            inference_vc.VC(a, (net_g, None, denoiser, world.mel_fn, ref_w2v))
    finally:
        net_g.voice_conversion_noise_control = orig_vc

    from scipy.io import wavfile

    name = (os.path.splitext(os.path.basename(world.src_path))[0] + "_to_"
            + os.path.splitext(os.path.basename(world.prompt_path))[0] + ".wav")
    sr, data = wavfile.read(os.path.join(str(out_dir), name))
    assert sr == 16000
    return data.astype(np.float32) / 32767.0, cap


def _vc_f0s(world):
    """The f0s our pipeline receives: same frames the stub hands the
    reference (source padded to a 1280-multiple, target unpadded)."""
    t_s = len(world.src_f32)
    pad = (t_s // 1280 + 1) * 1280 - t_s
    src_pad = np.pad(world.src_f32, (0, pad))
    src_f0 = _fake_yaapt_f0(src_pad[None])[0, 0]
    trg_f0 = _fake_yaapt_f0(world.prompt_f32[None])[0, 0]
    return src_f0, trg_f0


@pytest.mark.slow
def test_vc_composed_parity(world, w2v_pair):
    """Full composed VC path vs reference VC() (inference_vc.py:70-172):
    source pad-to-1280 -> reflect-pad-40 w2v -> speaker-stat f0 transfer ->
    log(f0+1) -> target mel pair -> voice_conversion_noise_control -> max
    norm. noise_scale_vc=0 for determinism; shared deterministic f0 stub."""
    w2v_t, w2v_j, w2v_params = w2v_pair
    ref_wav, cap = _run_reference_vc(world, w2v_t, world.tmp / "vc0")

    src_f0, trg_f0 = _vc_f0s(world)
    ours_wav, inter = world.pipe.vc(
        world.src_f32, world.prompt_f32, w2v_j, w2v_params,
        noise_scale_vc=0.0, output_sr=16000, src_f0=src_f0, trg_f0=trg_f0,
        return_intermediates=True,
    )

    d, rel = _report("vc.w2v", inter["w2v"][0], cap["w2v"][0].numpy().T)
    assert rel < 1e-3 and np.quantile(d, 0.99) < 2e-2

    ref_lf0 = cap["f0"].numpy().reshape(-1)
    assert inter["lf0"].shape[0] == ref_lf0.shape[0], \
        (inter["lf0"].shape, ref_lf0.shape)
    d, _ = _report("vc.lf0", inter["lf0"], ref_lf0)
    assert d.max() < 1e-5

    assert len(ours_wav) == len(ref_wav), (len(ours_wav), len(ref_wav))
    # random-weight vocoder output is noise-like, so corr is content-
    # sensitive; relL2 is the load-bearing bound (fp32 conv-stack drift)
    d, rel = _report("vc.wav", ours_wav, ref_wav)
    corr = np.corrcoef(ours_wav, ref_wav)[0, 1]
    print(f"vc wav corr={corr:.6f}")
    assert corr > 0.998
    assert rel < 5e-3


@pytest.mark.slow
def test_vc_composed_parity_denoise(world, w2v_pair):
    """denoise_ratio=0.8 VC: MP-SENet on the padded target + the vocoder's
    internal style interpolation between the [orig; denoised] mel rows
    (inference_vc.py:127-137)."""
    from megatts2_hierspeechpp_tpu.models.convert import convert_denoiser

    w2v_t, w2v_j, w2v_params = w2v_pair
    h, den_t = _make_denoiser()
    world.pipe.denoiser = MPNet(dense_channel=16, num_tsblocks=2, n_freqs=201)
    world.pipe.denoiser_vars = convert_denoiser(den_t.state_dict(), num_tsblocks=2)
    try:
        ref_wav, cap = _run_reference_vc(
            world, w2v_t, world.tmp / "vc_dn", denoise_ratio=0.8,
            denoiser=den_t, hps_denoiser=h,
        )
        src_f0, trg_f0 = _vc_f0s(world)
        ours_wav = world.pipe.vc(
            world.src_f32, world.prompt_f32, w2v_j, w2v_params,
            noise_scale_vc=0.0, denoise_ratio=0.8, output_sr=16000,
            src_f0=src_f0, trg_f0=trg_f0,
        )
    finally:
        world.pipe.denoiser = None
        world.pipe.denoiser_vars = None

    assert len(ours_wav) == len(ref_wav)
    d, rel = _report("vc.wav(denoise)", ours_wav, ref_wav)
    corr = np.corrcoef(ours_wav, ref_wav)[0, 1]
    print(f"vc wav corr={corr:.6f}")
    assert corr > 0.998
    assert rel < 5e-3
