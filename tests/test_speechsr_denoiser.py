"""Parity tests: SpeechSR generator and MP-SENet denoiser vs reference."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR, interp_linear
from megatts2_hierspeechpp_tpu.models.denoiser import MPNet
from megatts2_hierspeechpp_tpu.models.convert import convert_speechsr, convert_denoiser

torch_ref.add_reference_path()


def test_interp_linear_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 40, 3)).astype(np.float32)
    for out in [60, 120, 30]:
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 2, 1)), out, mode="linear"
            )
            .numpy()
            .transpose(0, 2, 1)
        )
        mine = np.asarray(interp_linear(jnp.asarray(x), out))
        np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant,ratio", [("speechsr48k", 3.0), ("speechsr24k", 1.5)])
def test_speechsr_matches_reference(variant, ratio):
    import importlib

    ref_mod = importlib.import_module(f"{variant}.speechsr")

    torch.manual_seed(0)
    tmod = ref_mod.SynthesizerTrn(
        spec_channels=128,
        segment_size=32,
        resblock="0",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[3],
        upsample_initial_channel=32,
        upsample_kernel_sizes=[3],
    ).eval()
    with torch.no_grad():
        for name, pt in tmod.named_parameters():
            if name.endswith(".alpha") or name.endswith(".beta"):
                pt.normal_(0, 0.2)

    x = np.random.default_rng(1).standard_normal((1, 640, 1)).astype(np.float32) * 0.1
    with torch.no_grad():
        yt = tmod.infer(torch.from_numpy(x.transpose(0, 2, 1))).transpose(1, 2).numpy()

    num, den = (3, 1) if ratio == 3.0 else (3, 2)
    jmod = SpeechSR(upsample_initial_channel=32, rate_num=num, rate_den=den)
    params = {"params": convert_speechsr(tmod.state_dict(), "dec")}
    yj = jmod.apply(params, jnp.asarray(x))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yj), yt, atol=2e-4)


def test_denoiser_matches_reference():
    from denoiser.generator import MPNet as RefMPNet
    from megatts2_hierspeechpp_tpu.utils.config import HParams

    h = HParams(
        dense_channel=16, compress_factor=0.3, num_tsconformers=2, beta=2.0,
        sampling_rate=16000, segment_size=32000, n_fft=400, hop_size=100,
        win_size=400,
    )
    torch.manual_seed(0)
    tmod = RefMPNet(h, num_tscblocks=2).eval()

    b, t, f = 1, 10, 201
    rng = np.random.default_rng(2)
    mag = np.abs(rng.standard_normal((b, t, f))).astype(np.float32)
    pha = rng.uniform(-np.pi, np.pi, (b, t, f)).astype(np.float32)

    with torch.no_grad():
        mag_t, pha_t, _ = tmod(
            torch.from_numpy(mag.transpose(0, 2, 1)),
            torch.from_numpy(pha.transpose(0, 2, 1)),
        )
        mag_t = mag_t.numpy().transpose(0, 2, 1)
        pha_t = pha_t.numpy().transpose(0, 2, 1)

    jmod = MPNet(dense_channel=16, num_tsblocks=2, n_freqs=201)
    variables = convert_denoiser(tmod.state_dict(), num_tsblocks=2)
    mag_j, pha_j = jmod.apply(variables, jnp.asarray(mag), jnp.asarray(pha))
    np.testing.assert_allclose(np.asarray(mag_j), mag_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pha_j), pha_t, atol=2e-4)
