"""Whole-model converters: reference torch checkpoints -> flax param trees.

Reference checkpoint format: torch.save({'model': state_dict, 'iteration': ...,
'optimizer': ..., 'learning_rate': ...}) (/root/reference/utils.py:19-57).
"""
from __future__ import annotations

from megatts2_hierspeechpp_tpu.utils import convert_ref as cr
from megatts2_hierspeechpp_tpu.utils.convert_ref import _j


def posterior_sf_encoder(sd, p) -> dict:
    return {
        "pre_source": cr.dense_from_conv1x1(sd, _j(p, "pre_source")),
        "pre_filter": cr.conv1d(sd, _j(p, "pre_filter")),
        "source_enc": cr.wn(sd, _j(p, "source_enc"), 8),
        "filter_enc": cr.wn(sd, _j(p, "filter_enc"), 8),
        "enc": cr.wn(sd, _j(p, "enc"), 8),
        "proj": cr.dense_from_conv1x1(sd, _j(p, "proj")),
    }


def posterior_audio_encoder(sd, p, n_wn_layers=16) -> dict:
    out = {
        "pre": cr.dense_from_conv1x1(sd, _j(p, "pre")),
        "down_pre": cr.conv1d(sd, _j(p, "down_pre")),
        "activation_post": cr.snakebeta(sd, _j(p, "activation_post.act")),
        "conv_post": cr.conv1d(sd, _j(p, "conv_post")),
        "enc": cr.wn(sd, _j(p, "enc"), n_wn_layers),
        "proj": cr.dense_from_conv1x1(sd, _j(p, "proj")),
    }
    for i in range(4):
        out[f"downs_{i}"] = cr.wn_conv1d(sd, _j(p, f"downs.{i}"))
    for r in range(12):
        out[f"resblocks_{r}"] = cr.ampblock(sd, _j(p, f"resblocks.{r}"))
    return out


def mel_decoder(sd, p) -> dict:
    return {
        "conv_pre": cr.conv1d(sd, _j(p, "conv_pre")),
        "cond": cr.dense_from_conv1x1(sd, _j(p, "cond")),
        "encoder": cr.vits_encoder(sd, _j(p, "encoder"), 2),
        "proj": cr.dense_from_conv1x1(sd, _j(p, "proj")),
    }


def source_network(sd, p) -> dict:
    out = {
        "conv_pre": cr.wn_conv1d(sd, _j(p, "conv_pre")),
        "cond": cr.dense_from_conv1x1(sd, _j(p, "cond")),
        "activation_post": cr.snakebeta(sd, _j(p, "activation_post.act")),
        "conv_post": cr.conv1d(sd, _j(p, "conv_post")),
    }
    for i in range(2):
        out[f"ups_{i}"] = cr.wn_conv_transpose1d(sd, _j(p, f"ups.{i}"))
    for r in range(6):
        out[f"resblocks_{r}"] = cr.ampblock(sd, _j(p, f"resblocks.{r}"))
    return out


def dblock(sd, p) -> dict:
    out = {"residual_dense": cr.wn_conv1d(sd, _j(p, "residual_dense"))}
    for i in range(3):
        out[f"conv_{i}"] = cr.wn_conv1d(sd, _j(p, f"conv.{i}"))
    return out


def generator(sd, p, n_ups, n_kernels=3) -> dict:
    out = {
        "conv_pre": cr.wn_conv1d(sd, _j(p, "conv_pre")),
        "downs": dblock(sd, _j(p, "downs")),
        "cond": cr.dense_from_conv1x1(sd, _j(p, "cond")),
        "proj": cr.conv1d(sd, _j(p, "proj")),
        "activation_post": cr.snakebeta(sd, _j(p, "activation_post.act")),
        "conv_post": cr.conv1d(sd, _j(p, "conv_post")),
    }
    for i in range(n_ups):
        out[f"ups_{i}"] = cr.wn_conv_transpose1d(sd, _j(p, f"ups.{i}"))
    for r in range(n_ups * n_kernels):
        out[f"resblocks_{r}"] = cr.ampblock(sd, _j(p, f"resblocks.{r}"))
    return out


def convert_vocoder(sd, n_ups: int = 5) -> dict:
    """Reference hierspeechpp SynthesizerTrn state_dict -> HierVocoder params."""
    return {
        "enc_p_l": posterior_sf_encoder(sd, "enc_p_l"),
        "flow_l": cr.dit_coupling_block(sd, "flow_l", 4, 3),
        "enc_p": posterior_sf_encoder(sd, "enc_p"),
        "enc_q": posterior_audio_encoder(sd, "enc_q"),
        "flow": cr.dit_coupling_block(sd, "flow", 4, 3),
        "mel_decoder": mel_decoder(sd, "mel_decoder"),
        "dec": generator(sd, "dec", n_ups),
        "sn": source_network(sd, "sn"),
        "emb_g": cr.style_encoder(sd, "emb_g"),
    }


def ttv_text_encoder(sd, p) -> dict:
    return {
        "emb": cr.embedding(sd, _j(p, "emb")),
        "emb_tone": cr.embedding(sd, _j(p, "emb_tone")),
        "emb_language": cr.embedding(sd, _j(p, "emb_language")),
        "encoder": cr.vits_encoder(sd, _j(p, "encoder"), 3),
        "encoder2": cr.vits_encoder(sd, _j(p, "encoder2"), 1),
    }


def ttv_mel_encoder(sd, p) -> dict:
    return {
        "encoder": cr.vits_encoder(sd, _j(p, "encoder"), 2),
        "proj": cr.dense_from_conv1x1(sd, _j(p, "proj")),
    }


def ttv_w2v_encoder(sd, p) -> dict:
    return {
        "cond": cr.dense_from_conv1x1(sd, _j(p, "cond")),
        "encoder": cr.vits_encoder(sd, _j(p, "encoder"), 3),
        "encoder2": cr.vits_encoder(sd, _j(p, "encoder2"), 1),
    }


def ttv_w2v_decoder(sd, p) -> dict:
    return {
        "pre": cr.dense_from_conv1x1(sd, _j(p, "pre")),
        "enc": cr.wn(sd, _j(p, "enc"), 8),
        "proj": cr.dense_from_conv1x1(sd, _j(p, "proj")),
    }


def pitch_predictor(sd, p) -> dict:
    out = {
        "conv_pre": cr.conv1d(sd, _j(p, "conv_pre")),
        "cond": cr.dense_from_conv1x1(sd, _j(p, "cond")),
        "conv_post": cr.conv1d(sd, _j(p, "conv_post")),
    }
    for i in range(2):
        out[f"ups_{i}"] = cr.wn_conv_transpose1d(sd, _j(p, f"ups.{i}"))
    for r in range(6):
        out[f"resblocks_{r}"] = cr.resblock1(sd, _j(p, f"resblocks.{r}"))
    return out


def rvq_state(sd, p, n_q=1) -> dict:
    """Reference quantizer buffers -> flax 'vq' collection."""
    import numpy as np

    out = {}
    for i in range(n_q):
        q = _j(p, f"vq.layers.{i}._codebook")
        out[f"vq_{i}"] = {
            "codebook": {
                "embed": cr._np(sd, f"{q}.embed"),
                "embed_avg": cr._np(sd, f"{q}.embed_avg"),
                "cluster_size": cr._np(sd, f"{q}.cluster_size"),
                "inited": np.asarray(cr._np(sd, f"{q}.inited").reshape(()) > 0),
            }
        }
    return out


def convert_ttv(sd) -> dict:
    """Reference ttv SynthesizerTrn state_dict -> {'params':..., 'vq':...}."""
    params = {
        "enc_p": ttv_text_encoder(sd, "enc_p"),
        "mel_encoder": ttv_mel_encoder(sd, "mel_encoder"),
        "mha": cr.mha(sd, "mha"),
        "cond_g": cr.dense_from_conv1x1(sd, "cond_g"),
        "w2v_encoder": ttv_w2v_encoder(sd, "w2v_encoder"),
        "w2v_decoder": ttv_w2v_decoder(sd, "w2v_decoder"),
        "emb_g": cr.style_encoder(sd, "emb_g"),
        "duration_predictor": cr.duration_predictor(sd, "duration_predictor"),
        "range_predictor": cr.range_predictor(sd, "RangePredictor"),
        "dur_downsample": cr.conv1d(sd, "dur_downsample"),
        "pp": pitch_predictor(sd, "pp"),
        "plm_conv1": {"conv1": cr.conv1d(sd, "plm_conv1.conv1"),
                      "conv2": cr.conv1d(sd, "plm_conv1.conv2")},
        "plm_conv2": {"conv1": cr.conv1d(sd, "plm_conv2.conv1"),
                      "conv2": cr.conv1d(sd, "plm_conv2.conv2")},
        "ssl_proj": cr.dense_from_conv1x1(sd, "ssl_proj"),
    }
    vq = {"quantizer": rvq_state(sd, "quantizer")}
    return {"params": params, "vq": vq}


def plm_layer(sd, p) -> dict:
    return {
        "norm1": cr.layer_norm(sd, _j(p, "norm1")),
        "norm2": cr.layer_norm(sd, _j(p, "norm2")),
        "w_q": cr.dense(sd, _j(p, "attn.w_q")),
        "w_k": cr.dense(sd, _j(p, "attn.w_k")),
        "w_v": cr.dense(sd, _j(p, "attn.w_v")),
        "out_proj": cr.dense(sd, _j(p, "attn.out_proj.0")),
        "ff_0": cr.dense(sd, _j(p, "ff.0")),
        "ff_1": cr.dense(sd, _j(p, "ff.3")),
    }


def convert_plm(sd, n_layers: int = 4) -> dict:
    """Reference Megatts2PLM1 state_dict -> ProsodyLM params."""
    params = {
        "pc_embedding": cr.embedding(sd, "pc_embedding"),
        "pos_alpha": cr._np(sd, "pos_emb.alpha"),
        "predict_layer": cr.dense(sd, "predict_layer"),
    }
    for i in range(n_layers):
        params[f"layer_{i}"] = plm_layer(sd, f"plm.layers.{i}")
    return params


def convert_speechsr(sd, prefix: str = "dec") -> dict:
    """Reference speechsr SynthesizerTrn (dec=Generator) -> SpeechSR params."""
    out = {
        "conv_pre": cr.wn_conv1d(sd, _j(prefix, "conv_pre")),
        "activation_post": cr.snakebeta(sd, _j(prefix, "activation_post.act")),
        "conv_post": cr.conv1d(sd, _j(prefix, "conv_post")),
    }
    for j in range(3):
        out[f"resblocks_{j}"] = cr.ampblock(sd, _j(prefix, f"resblocks.{j}"))
    return out


def _instance_norm(sd, p) -> dict:
    return {"scale": cr._np(sd, _j(p, "weight")), "bias": cr._np(sd, _j(p, "bias"))}


def _prelu(sd, p) -> dict:
    return {"alpha": cr._np(sd, _j(p, "weight"))}


def _dense_block(sd, p) -> dict:
    out = {}
    for i in range(4):
        out[f"conv_{i}"] = cr.conv2d(sd, _j(p, f"dense_block.{i}.0"))
        out[f"norm_{i}"] = _instance_norm(sd, _j(p, f"dense_block.{i}.1"))
        out[f"act_{i}"] = _prelu(sd, _j(p, f"dense_block.{i}.2"))
    return out


def _torch_mha(sd, p) -> dict:
    import numpy as np

    return {
        "in_proj_weight": cr._np(sd, _j(p, "in_proj_weight")),
        "in_proj_bias": cr._np(sd, _j(p, "in_proj_bias")),
        "out_proj": cr.dense(sd, _j(p, "out_proj")),
    }


def _conformer(sd, p):
    params = {
        "ffm1": {
            "norm": cr.layer_norm(sd, _j(p, "ffm1.ffm.0")),
            "fc1": cr.dense(sd, _j(p, "ffm1.ffm.1")),
            "fc2": cr.dense(sd, _j(p, "ffm1.ffm.4")),
        },
        "attn_norm": cr.layer_norm(sd, _j(p, "attn.layernorm")),
        "attn": _torch_mha(sd, _j(p, "attn.attn")),
        "ccm": {
            "norm": cr.layer_norm(sd, _j(p, "ccm.ccm.0")),
            "pw1": cr.conv1d(sd, _j(p, "ccm.ccm.2")),
            "dw": cr.conv1d(sd, _j(p, "ccm.ccm.4")),
            "bn": {
                "scale": cr._np(sd, _j(p, "ccm.ccm.5.weight")),
                "bias": cr._np(sd, _j(p, "ccm.ccm.5.bias")),
            },
            "pw2": cr.conv1d(sd, _j(p, "ccm.ccm.7")),
        },
        "ffm2": {
            "norm": cr.layer_norm(sd, _j(p, "ffm2.ffm.0")),
            "fc1": cr.dense(sd, _j(p, "ffm2.ffm.1")),
            "fc2": cr.dense(sd, _j(p, "ffm2.ffm.4")),
        },
        "post_norm": cr.layer_norm(sd, _j(p, "post_norm")),
    }
    stats = {
        "ccm": {
            "bn": {
                "mean": cr._np(sd, _j(p, "ccm.ccm.5.running_mean")),
                "var": cr._np(sd, _j(p, "ccm.ccm.5.running_var")),
            }
        }
    }
    return params, stats


def _conv_transpose2d_1x3(sd, p) -> dict:
    """torch ConvTranspose2d weight (Cin, Cout, 1, 3) -> flipped (3, Cin, Cout)."""
    import numpy as np

    w = cr._np(sd, _j(p, "weight"))[:, :, 0, ::-1]  # (Cin, Cout, 3) flipped
    return {
        "up_kernel": np.transpose(w, (2, 0, 1)),
        "up_bias": cr._np(sd, _j(p, "bias")),
    }


def convert_denoiser(sd, num_tsblocks: int = 4):
    """Reference MPNet state_dict -> {'params':..., 'batch_stats':...}."""
    params = {
        "dense_encoder": {
            "conv1": cr.conv2d(sd, "dense_encoder.dense_conv_1.0"),
            "norm1": _instance_norm(sd, "dense_encoder.dense_conv_1.1"),
            "act1": _prelu(sd, "dense_encoder.dense_conv_1.2"),
            "dense": _dense_block(sd, "dense_encoder.dense_block"),
            "conv2": cr.conv2d(sd, "dense_encoder.dense_conv_2.0"),
            "norm2": _instance_norm(sd, "dense_encoder.dense_conv_2.1"),
            "act2": _prelu(sd, "dense_encoder.dense_conv_2.2"),
        },
        "mask_decoder": {
            "dense": _dense_block(sd, "mask_decoder.dense_block"),
            **_conv_transpose2d_1x3(sd, "mask_decoder.mask_conv.0"),
            "conv1": cr.conv2d(sd, "mask_decoder.mask_conv.1"),
            "norm": _instance_norm(sd, "mask_decoder.mask_conv.2"),
            "act": _prelu(sd, "mask_decoder.mask_conv.3"),
            "conv2": cr.conv2d(sd, "mask_decoder.mask_conv.4"),
            "lsigmoid": {"slope": cr._np(sd, "mask_decoder.lsigmoid.slope").reshape(-1)},
        },
        "phase_decoder": {
            "dense": _dense_block(sd, "phase_decoder.dense_block"),
            **_conv_transpose2d_1x3(sd, "phase_decoder.phase_conv.0"),
            "norm": _instance_norm(sd, "phase_decoder.phase_conv.1"),
            "act": _prelu(sd, "phase_decoder.phase_conv.2"),
            "conv_r": cr.conv2d(sd, "phase_decoder.phase_conv_r"),
            "conv_i": cr.conv2d(sd, "phase_decoder.phase_conv_i"),
        },
    }
    batch_stats = {}
    for i in range(num_tsblocks):
        t_params, t_stats = _conformer(sd, f"TSConformer.{i}.time_conformer")
        f_params, f_stats = _conformer(sd, f"TSConformer.{i}.freq_conformer")
        params[f"ts_{i}"] = {"time": t_params, "freq": f_params}
        batch_stats[f"ts_{i}"] = {"time": t_stats, "freq": f_stats}
    return {"params": params, "batch_stats": batch_stats}


def disc_p(sd, p) -> dict:
    out = {f"convs_{i}": cr.wn_conv2d(sd, _j(p, f"convs.{i}")) for i in range(5)}
    out["conv_post"] = cr.wn_conv2d(sd, _j(p, "conv_post"))
    return out


def disc_r(sd, p) -> dict:
    out = {f"convs_{i}": cr.wn_conv2d(sd, _j(p, f"convs.{i}")) for i in range(5)}
    out["conv_post"] = cr.wn_conv2d(sd, _j(p, "conv_post"))
    return out


def convert_mpd(sd, prefix: str = "", n_res: int = 5) -> dict:
    """Reference MultiPeriodDiscriminator -> MultiPeriodDiscriminator params."""
    out = {}
    for i in range(n_res):
        out[f"disc_r_{i}"] = disc_r(sd, _j(prefix, f"discriminators.{i}"))
    for i in range(5):
        out[f"disc_p_{i}"] = disc_p(sd, _j(prefix, f"discriminators.{n_res + i}"))
    return out


def _sn_conv2d(sd, p):
    """torch spectral_norm(Conv2d) -> (params, spectral state)."""
    params = {
        "kernel": cr.tc.conv2d_kernel(cr._np(sd, _j(p, "weight_orig"))),
        "bias": cr._np(sd, _j(p, "bias")),
    }
    spectral = {
        "u": cr._np(sd, _j(p, "weight_u")),
        "v": cr._np(sd, _j(p, "weight_v")),
    }
    return params, spectral


def spec_discriminator(sd, p, spectral_norm=False):
    params, spec_state = {}, {}
    for i in range(4):
        if spectral_norm:
            params[f"convs_{i}"], spec_state[f"convs_{i}"] = _sn_conv2d(
                sd, _j(p, f"discriminators.{i}")
            )
        else:
            params[f"convs_{i}"] = cr.wn_conv2d(sd, _j(p, f"discriminators.{i}"))
    if spectral_norm:
        params["out"], spec_state["out"] = _sn_conv2d(sd, _j(p, "out"))
    else:
        params["out"] = cr.wn_conv2d(sd, _j(p, "out"))
    return params, spec_state


def convert_mrsd(sd, prefix: str = ""):
    """Reference MultiResSpecDiscriminator -> {'params':..., 'spectral':...}."""
    p0, s0 = spec_discriminator(sd, _j(prefix, "discriminators.0"), spectral_norm=True)
    p1, _ = spec_discriminator(sd, _j(prefix, "discriminators.1"), spectral_norm=False)
    return {"params": {"disc_0": p0, "disc_1": p1}, "spectral": {"disc_0": s0}}


def convert_wav2vec2(sd, output_layer: int = 7, pos_kernel: int = 128) -> dict:
    """HF Wav2Vec2ForPreTraining (layer-norm feat-extract, stable-LN encoder)
    state_dict -> Wav2Vec2 params. Weight-norm on pos_conv fused (dim=2)."""
    import numpy as np

    pfx = "wav2vec2." if any(k.startswith("wav2vec2.") for k in sd) else ""

    fe = {}
    for i in range(7):
        base = f"{pfx}feature_extractor.conv_layers.{i}"
        fe[f"conv_{i}"] = cr.conv1d(sd, f"{base}.conv")
        fe[f"ln_{i}"] = cr.layer_norm(sd, f"{base}.layer_norm")

    params = {
        "feature_extractor": fe,
        "fp_ln": cr.layer_norm(sd, f"{pfx}feature_projection.layer_norm"),
        "fp_proj": cr.dense(sd, f"{pfx}feature_projection.projection"),
    }

    # pos conv: weight_norm dim=2 -> w = g * v / ||v||_(dims 0,1)
    base = f"{pfx}encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g = cr._np(sd, f"{base}.weight_g")  # (1, 1, K)
        v = cr._np(sd, f"{base}.weight_v")  # (Cout, Cin/g, K)
    else:
        g = cr._np(sd, f"{base}.parametrizations.weight.original0")
        v = cr._np(sd, f"{base}.parametrizations.weight.original1")
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm
    params["pos_conv"] = {
        "kernel": cr.tc.conv1d_kernel(w),
        "bias": cr._np(sd, f"{base}.bias"),
    }

    for i in range(output_layer):
        base = f"{pfx}encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "attn_ln": cr.layer_norm(sd, f"{base}.layer_norm"),
            "attn": {
                "q_proj": cr.dense(sd, f"{base}.attention.q_proj"),
                "k_proj": cr.dense(sd, f"{base}.attention.k_proj"),
                "v_proj": cr.dense(sd, f"{base}.attention.v_proj"),
                "out_proj": cr.dense(sd, f"{base}.attention.out_proj"),
            },
            "ffn_ln": cr.layer_norm(sd, f"{base}.final_layer_norm"),
            "ff1": cr.dense(sd, f"{base}.feed_forward.intermediate_dense"),
            "ff2": cr.dense(sd, f"{base}.feed_forward.output_dense"),
        }
    return params


def convert_hubert(sd, n_layers: int = 12) -> dict:
    """HF HubertModel (group-norm feat-extract, post-norm encoder — the
    cnhubert/chinese-hubert-base family) state_dict -> Hubert params."""
    import numpy as np

    pfx = "hubert." if any(k.startswith("hubert.") for k in sd) else ""

    fe = {"gn_0": {
        "scale": cr._np(sd, f"{pfx}feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": cr._np(sd, f"{pfx}feature_extractor.conv_layers.0.layer_norm.bias"),
    }}
    for i in range(7):
        w = cr._np(sd, f"{pfx}feature_extractor.conv_layers.{i}.conv.weight")
        fe[f"conv_{i}"] = {"kernel": cr.tc.conv1d_kernel(w)}

    params = {
        "feature_extractor": fe,
        "fp_ln": cr.layer_norm(sd, f"{pfx}feature_projection.layer_norm"),
        "fp_proj": cr.dense(sd, f"{pfx}feature_projection.projection"),
        "enc_ln": cr.layer_norm(sd, f"{pfx}encoder.layer_norm"),
    }

    base = f"{pfx}encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g = cr._np(sd, f"{base}.weight_g")
        v = cr._np(sd, f"{base}.weight_v")
    else:
        g = cr._np(sd, f"{base}.parametrizations.weight.original0")
        v = cr._np(sd, f"{base}.parametrizations.weight.original1")
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm
    params["pos_conv"] = {
        "kernel": cr.tc.conv1d_kernel(w),
        "bias": cr._np(sd, f"{base}.bias"),
    }

    for i in range(n_layers):
        base = f"{pfx}encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "q_proj": cr.dense(sd, f"{base}.attention.q_proj"),
                "k_proj": cr.dense(sd, f"{base}.attention.k_proj"),
                "v_proj": cr.dense(sd, f"{base}.attention.v_proj"),
                "out_proj": cr.dense(sd, f"{base}.attention.out_proj"),
            },
            "attn_ln": cr.layer_norm(sd, f"{base}.layer_norm"),
            "ff1": cr.dense(sd, f"{base}.feed_forward.intermediate_dense"),
            "ff2": cr.dense(sd, f"{base}.feed_forward.output_dense"),
            "ffn_ln": cr.layer_norm(sd, f"{base}.final_layer_norm"),
        }
    return params


def t2s_layer(sd, p) -> dict:
    return {
        "in_proj_weight": cr._np(sd, _j(p, "self_attn.in_proj_weight")),
        "in_proj_bias": cr._np(sd, _j(p, "self_attn.in_proj_bias")),
        "out_proj": cr.dense(sd, _j(p, "self_attn.out_proj")),
        "linear1": cr.dense(sd, _j(p, "linear1")),
        "linear2": cr.dense(sd, _j(p, "linear2")),
        "norm1": cr.layer_norm(sd, _j(p, "norm1")),
        "norm2": cr.layer_norm(sd, _j(p, "norm2")),
    }


def convert_t2s(sd, n_layers: int = 12) -> dict:
    """Reference AR Text2SemanticDecoder state_dict -> Text2Semantic params."""
    params = {
        "bert_proj": cr.dense(sd, "bert_proj"),
        "ar_text_embedding": {
            "embedding": cr._np(sd, "ar_text_embedding.word_embeddings.weight")
        },
        "ar_audio_embedding": {
            "embedding": cr._np(sd, "ar_audio_embedding.word_embeddings.weight")
        },
        "text_pos_alpha": cr._np(sd, "ar_text_position.alpha"),
        "audio_pos_alpha": cr._np(sd, "ar_audio_position.alpha"),
        "ar_predict_layer": cr.dense(sd, "ar_predict_layer"),
    }
    for i in range(n_layers):
        params[f"layer_{i}"] = t2s_layer(sd, f"h.layers.{i}")
    return params


def convert_plm_noncausal(sd, n_layers: int = 4) -> dict:
    """Reference Megatts2PLM (variant A: rel-pos attentions.Encoder) ->
    ProsodyLMNonCausal params."""
    return {
        "pc_embedding": cr.embedding(sd, "pc_embedding"),
        "pos_alpha": cr._np(sd, "pos_emb.alpha"),
        "predict_layer": cr.dense(sd, "predict_layer"),
        "plm": cr.vits_encoder(sd, "plm", n_layers),
    }
