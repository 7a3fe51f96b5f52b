"""Test-only helper: import modules of the PyTorch reference repo as numerical
oracles (random weights, CPU). The reference repo at /root/reference imports a
few packages absent in this image (torchaudio, timm, librosa, amfm_decompy);
we inject minimal stand-ins so the pure-torch model code is importable.

The timm Attention stand-in replicates timm.models.vision_transformer.Attention
(standard pre-norm MHA with fused qkv) which the reference's DiTConVBlock uses
(/root/reference/modules.py:13,397).
"""
from __future__ import annotations

import importlib.machinery
import math
import sys
import types

import torch
from torch import nn


def _mk_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m

REFERENCE = "/root/reference"


class _TimmAttention(nn.Module):
    """Faithful stand-in for timm's vision_transformer.Attention (eval mode)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0, proj_drop=0.0):
        super().__init__()
        assert dim % num_heads == 0
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, self.head_dim)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        attn = self.attn_drop(attn)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = self.proj(x)
        x = self.proj_drop(x)
        return x


def _install_stubs():
    if "timm" not in sys.modules:
        timm = _mk_module("timm")
        timm_models = _mk_module("timm.models")
        timm_vit = _mk_module("timm.models.vision_transformer")
        timm_vit.Attention = _TimmAttention
        timm.models = timm_models
        timm_models.vision_transformer = timm_vit
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.vision_transformer"] = timm_vit

    if "torchaudio" not in sys.modules:
        ta = _mk_module("torchaudio")

        class _Spectrogram(nn.Module):
            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         window_fn=torch.hann_window, normalized=False,
                         center=True, pad_mode="reflect", power=2.0, **kw):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.n_fft // 2
                self.normalized = normalized
                self.center = center
                self.pad_mode = pad_mode or "constant"
                self.power = power
                self.register_buffer("window", window_fn(self.win_length))

            def forward(self, x):
                # torchaudio handles leading batch/channel dims by flattening
                shape = x.shape
                x = x.reshape(-1, shape[-1])
                spec = torch.stft(
                    x,
                    self.n_fft,
                    hop_length=self.hop_length,
                    win_length=self.win_length,
                    window=self.window,
                    center=self.center,
                    pad_mode=self.pad_mode,
                    normalized=False,
                    onesided=True,
                    return_complex=True,
                )
                if self.normalized:  # torchaudio True == window-L2 normalization
                    spec = spec / self.window.pow(2.0).sum().sqrt()
                spec = spec.reshape(shape[:-1] + spec.shape[-2:])
                if self.power is None:
                    return spec
                return spec.abs() ** self.power

        class _MelSpectrogram(nn.Module):
            """torchaudio.transforms.MelSpectrogram stand-in: power-2 centered
            STFT x HTK mel filterbank (norm=None) — the exact composition the
            reference's Mels_preprocess.MelSpectrogramFixed wraps."""

            def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                         hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                         window_fn=torch.hann_window, power=2.0, center=True,
                         pad_mode="reflect", norm=None, mel_scale="htk", **kw):
                super().__init__()
                self.spectrogram = _Spectrogram(
                    n_fft=n_fft, win_length=win_length, hop_length=hop_length,
                    window_fn=window_fn, center=center, pad_mode=pad_mode,
                    power=power,
                )
                from transformers.audio_utils import mel_filter_bank

                fb = mel_filter_bank(
                    num_frequency_bins=n_fft // 2 + 1,
                    num_mel_filters=n_mels,
                    min_frequency=f_min,
                    max_frequency=f_max or sample_rate / 2,
                    sampling_rate=sample_rate,
                    norm=norm,
                    mel_scale=mel_scale,
                )
                self.register_buffer("fb", torch.from_numpy(fb).float())

            def forward(self, x):
                spec = self.spectrogram(x)  # (..., n_freqs, F)
                return torch.einsum("...kf,km->...mf", spec, self.fb)

        def _ta_load(path):
            from scipy.io import wavfile

            sr, data = wavfile.read(path)
            if data.dtype.kind == "i":
                data = data.astype("float32") / float(
                    2 ** (8 * data.dtype.itemsize - 1)
                )
            else:
                data = data.astype("float32")
            if data.ndim == 1:
                data = data[None, :]
            else:
                data = data.T
            return torch.from_numpy(data.copy()), sr

        ta_transforms = _mk_module("torchaudio.transforms")
        ta_transforms.Spectrogram = _Spectrogram
        ta_transforms.MelSpectrogram = _MelSpectrogram
        ta_transforms.MelScale = None
        ta_functional = _mk_module("torchaudio.functional")
        ta_functional.resample = None  # tests always feed 16 kHz wavs
        ta.transforms = ta_transforms
        ta.functional = ta_functional
        ta.load = _ta_load
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = ta_transforms
        sys.modules["torchaudio.functional"] = ta_functional

    if "monotonic_align" not in sys.modules:
        ma = _mk_module("monotonic_align")
        ma_core = _mk_module("monotonic_align.core")
        ma.mask_from_lens = None
        ma.maximum_path = None
        ma_core.maximum_path_c = None
        ma.core = ma_core
        sys.modules["monotonic_align"] = ma
        sys.modules["monotonic_align.core"] = ma_core

    if "torchmetrics" not in sys.modules:
        tm = _mk_module("torchmetrics")
        tm_cls = _mk_module("torchmetrics.classification")

        class _MulticlassAccuracy:
            def __init__(self, *a, **k):
                self.top_k = k.get("top_k", 1)
                self.ignore_index = k.get("ignore_index", None)

            def __call__(self, logits, targets):
                # logits (B, C, T), targets (B, T); micro top-k accuracy
                topk = logits.topk(self.top_k, dim=1).indices  # (B, K, T)
                hit = (topk == targets.unsqueeze(1)).any(dim=1)
                if self.ignore_index is not None:
                    valid = targets != self.ignore_index
                    return (hit & valid).sum() / valid.sum().clamp(min=1)
                return hit.float().mean()

        tm_cls.MulticlassAccuracy = _MulticlassAccuracy
        tm.classification = tm_cls
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.classification"] = tm_cls

    for name in ("unidecode", "phonemizer", "inflect"):
        if name not in sys.modules:
            m = _mk_module(name)
            m.unidecode = lambda s: s
            m.phonemize = None
            m.engine = lambda: None
            sys.modules[name] = m

    # train_ms.py:18 imports Utils.ASR.models.ASRCNN — the Utils/ package is
    # absent from the reference repo itself (dangling dependency, SURVEY §2.9);
    # stub it so inference_plm.py (which imports train_ms) is importable.
    if "Utils" not in sys.modules:
        u = _mk_module("Utils")
        u_asr = _mk_module("Utils.ASR")
        u_models = _mk_module("Utils.ASR.models")

        class _ASRCNN(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        u_models.ASRCNN = _ASRCNN
        u.ASR = u_asr
        u_asr.models = u_models
        sys.modules["Utils"] = u
        sys.modules["Utils.ASR"] = u_asr
        sys.modules["Utils.ASR.models"] = u_models

    if "coloredlogs" not in sys.modules:
        cl = _mk_module("coloredlogs")
        cl.install = lambda *a, **k: None
        sys.modules["coloredlogs"] = cl

    if "amfm_decompy" not in sys.modules:
        am = _mk_module("amfm_decompy")
        am_basic = _mk_module("amfm_decompy.basic_tools")
        am_pyaapt = _mk_module("amfm_decompy.pYAAPT")
        am_basic.SignalObj = None  # YAAPT unavailable; callers must patch f0
        am_pyaapt.yaapt = None
        am.basic_tools = am_basic
        am.pYAAPT = am_pyaapt
        sys.modules["amfm_decompy"] = am
        sys.modules["amfm_decompy.basic_tools"] = am_basic
        sys.modules["amfm_decompy.pYAAPT"] = am_pyaapt

    if "phonemizer.backend" not in sys.modules:
        pb = _mk_module("phonemizer.backend")

        class _EspeakBackend:  # ttv_v1/text/cleaners.py:19 builds one at import
            def __init__(self, *a, **k):
                pass

            def phonemize(self, *a, **k):
                raise NotImplementedError("espeak unavailable in tests")

        pb.EspeakBackend = _EspeakBackend
        sys.modules["phonemizer"].backend = pb
        sys.modules["phonemizer.backend"] = pb

    # only stub genuinely-missing modules (joblib/sklearn are installed and
    # must not be shadowed — transformers imports sklearn -> joblib)
    import importlib.util

    if importlib.util.find_spec("pesq") is None and "pesq" not in sys.modules:
        pesq_m = _mk_module("pesq")
        pesq_m.pesq = None
        sys.modules["pesq"] = pesq_m

    if "librosa" not in sys.modules:
        librosa = _mk_module("librosa")
        librosa_util = _mk_module("librosa.util")
        librosa_filters = _mk_module("librosa.filters")
        librosa_util.normalize = None
        librosa_util.pad_center = None
        librosa_util.tiny = None
        librosa_filters.mel = None
        librosa.util = librosa_util
        librosa.filters = librosa_filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.util"] = librosa_util
        sys.modules["librosa.filters"] = librosa_filters


def add_reference_path():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def patch_cuda_noop():
    """Make .cuda()/.to('cuda') no-ops so the reference inference scripts —
    which call .cuda() at import time (data_utils.py:91) and throughout
    tts()/VC() — run unmodified on CPU. Call before importing inference_plm/
    inference_vc. Process-wide and idempotent (test-only)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def preload_ar_patched_mha():
    """The reference's AR/modules/patched_mha_with_cache.py uses typing.Tuple
    without importing it (latent bug; it only imports under older torch where
    `functional` re-exported typing names). Pre-exec it with the missing
    imports injected so the AR stack is importable as an oracle."""
    name = "AR.modules.patched_mha_with_cache"
    if name in sys.modules:
        return
    add_reference_path()
    import importlib

    importlib.import_module("AR")
    importlib.import_module("AR.modules")
    path = f"{REFERENCE}/AR/modules/patched_mha_with_cache.py"
    src = "from typing import Tuple, Optional, List\n" + open(path).read()
    mod = _mk_module(name)
    mod.__file__ = path
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)


def torch_seed(seed: int = 0):
    torch.manual_seed(seed)


def t2j(x: torch.Tensor):
    import numpy as np

    return np.asarray(x.detach().cpu().numpy())


def init_eval(module: nn.Module) -> nn.Module:
    module.eval()
    return module


def mha_scale_compat(scale: float) -> float:
    return scale


def rel_tol(a, b, atol=2e-4, rtol=2e-4) -> float:
    import numpy as np

    a = a if not isinstance(a, torch.Tensor) else t2j(a)
    b = b if not isinstance(b, torch.Tensor) else t2j(b)
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
