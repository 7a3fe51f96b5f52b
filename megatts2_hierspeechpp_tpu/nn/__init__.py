from megatts2_hierspeechpp_tpu.nn.conv import (
    Conv1d,
    ConvTranspose1d,
    WNConv1d,
    WNConvTranspose1d,
    Conv2d,
    WNConv2d,
)
