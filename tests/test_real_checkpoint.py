"""Golden test against the *trained* SpeechSR checkpoints shipped in the
reference repo: our converter + model vs the reference torch model on the
reference demo audio (example/reference_1.wav)."""
import numpy as np
import pytest
import torch
from scipy.io import wavfile

import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
from megatts2_hierspeechpp_tpu.models.convert import convert_speechsr
from megatts2_hierspeechpp_tpu.infer.pipeline import load_torch_checkpoint

torch_ref.add_reference_path()


@pytest.mark.parametrize(
    "variant,ckpt,num,den",
    [
        ("speechsr24k", "/root/reference/speechsr24k/G_340000.pth", 3, 2),
        ("speechsr48k", "/root/reference/speechsr48k/G_100000.pth", 3, 1),
    ],
)
def test_trained_speechsr_checkpoint_parity(variant, ckpt, num, den):
    import importlib

    ref_mod = importlib.import_module(f"{variant}.speechsr")

    sd = load_torch_checkpoint(ckpt)
    tmod = ref_mod.SynthesizerTrn(
        spec_channels=128, segment_size=32, resblock="0",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[3], upsample_initial_channel=32, upsample_kernel_sizes=[3],
    ).eval()
    tmod.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})

    sr_in, wav = wavfile.read("/root/reference/example/reference_1.wav")
    assert sr_in == 16000
    audio = (wav.astype(np.float32) / 32768.0)[:16000]  # 1 s

    with torch.no_grad():
        y_ref = (
            tmod.infer(torch.from_numpy(audio)[None, None, :])
            .squeeze()
            .numpy()
        )

    jmod = SpeechSR(upsample_initial_channel=32, rate_num=num, rate_den=den)
    params = {"params": convert_speechsr(sd, "dec")}
    y_j = np.asarray(jmod.apply(params, jnp.asarray(audio)[None, :, None]))[0, :, 0]

    assert y_j.shape == y_ref.shape
    # trained weights, real audio: outputs must agree to fp precision
    assert np.abs(y_j - y_ref).max() < 2e-4
    # and correlate ~perfectly
    denom = np.linalg.norm(y_j) * np.linalg.norm(y_ref)
    corr = float(np.dot(y_j, y_ref) / denom)
    assert corr > 0.99999
