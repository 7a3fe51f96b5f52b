"""Build a serving TTSPipeline from THIS framework's own training runs.

The reference serves only from its released torch checkpoints
(/root/reference/inference_plm.py:236-258 loads G_*.pth files); here the
training CLIs (cli/train_s2.py, cli/train_s1.py, cli/train_vocoder.py) write
orbax train states under <run_dir>/ckpt/step_XXXXXXXX, and this module lifts
the serving-relevant subtrees out of them:

  - s2 run   -> ttv_vars      = {"params": state.params_g, "vq": state.vq}
  - s1 run   -> plm_params    = state.params_plm
  - voc run  -> vocoder_params = {"params": state.params_g}
  - sr run   -> speechsr_params = state.params_g   (cli/train_sr.py), or a
                reference .pth via models/convert (the in-repo trained ones)

Model defs are reconstructed exactly as the trainer CLIs construct them
(defaults + the run dir's saved config.json for the vocoder's model knobs),
so param trees line up by construction. Serving compute dtype is independent
of training dtype (params are stored fp32; pass dtype=jnp.bfloat16 on TPU).
"""
from __future__ import annotations

import json
import os
from typing import Optional

from megatts2_hierspeechpp_tpu.data import text as text_frontend
from megatts2_hierspeechpp_tpu.infer.pipeline import (
    TTSPipeline,
    load_torch_checkpoint,
)
from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM
from megatts2_hierspeechpp_tpu.models.speechsr import SpeechSR
from megatts2_hierspeechpp_tpu.models.ttv import TTVModel
from megatts2_hierspeechpp_tpu.models.vocoder import HierVocoder
from megatts2_hierspeechpp_tpu.train import checkpoints as ckpt_lib


def _run_config(run_dir: str) -> dict:
    path = os.path.join(run_dir, "config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _raw(run_dir: str, step: Optional[int] = None):
    state = ckpt_lib.restore_raw(os.path.join(run_dir, "ckpt"), step)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {run_dir}/ckpt")
    return state


def build_pipeline_from_train_dirs(
    s2_dir: str,
    s1_dir: str,
    voc_dir: str,
    speechsr: Optional[str] = None,
    speechsr_rate: int = 48000,
    dtype=None,
    aot_dir: Optional[str] = None,
) -> TTSPipeline:
    """Assemble a TTSPipeline from finished training-run directories.

    `speechsr` may be a cli/train_sr.py run dir OR a reference .pth
    checkpoint (the in-repo trained SpeechSR weights); None disables SR.
    """
    kw = {} if dtype is None else {"dtype": dtype}

    s2 = _raw(s2_dir)
    ttv = TTVModel(n_vocab=text_frontend.N_VOCAB, n_tone=text_frontend.N_TONE,
                   n_language=text_frontend.N_LANGUAGE, **kw)
    ttv_vars = {"params": s2["params_g"], "vq": s2["vq"]}

    s1 = _raw(s1_dir)
    plm = ProsodyLM(**kw)
    plm_params = s1["params_plm"]

    voc_state = _raw(voc_dir)
    # only override knobs the run's config actually recorded; fall back to
    # the HierVocoder dataclass defaults (= configs/hierspeechpp.json)
    mcfg = _run_config(voc_dir).get("model", {})
    voc_keys = ("spec_channels", "inter_channels", "hidden_channels",
                "filter_channels", "upsample_rates",
                "upsample_initial_channel", "upsample_kernel_sizes")
    voc_kw = {k: tuple(v) if isinstance(v := mcfg[k], list) else v
              for k in voc_keys if k in mcfg}
    voc = HierVocoder(**voc_kw, **kw)
    voc_params = {"params": voc_state["params_g"]}

    sr_model = sr_params = None
    if speechsr:
        num, den = (3, 1) if speechsr_rate == 48000 else (3, 2)
        sr_model = SpeechSR(rate_num=num, rate_den=den, **kw)
        if os.path.isdir(speechsr):
            sr_params = _raw(speechsr)["params_g"]
        else:
            from megatts2_hierspeechpp_tpu.models import convert as C

            sr_params = C.convert_speechsr(
                load_torch_checkpoint(speechsr), "dec")

    return TTSPipeline(
        ttv=ttv, ttv_vars=ttv_vars, plm=plm, plm_params=plm_params,
        vocoder=voc, vocoder_params=voc_params,
        speechsr=sr_model, speechsr_params=sr_params,
        aot_dir=aot_dir,
    )
