from megatts2_hierspeechpp_tpu.utils.config import HParams, load_hparams
from megatts2_hierspeechpp_tpu.utils.masking import (
    sequence_mask,
    attn_mask_from,
    causal_attn_mask,
)
