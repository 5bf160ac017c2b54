"""fairseq <-> s2st_tpu checkpoint conversion for the s2st_transformer.

Imports the reference's torch ``.pt`` checkpoints
(``examples/s2s_trans/models/s2st_transformer.py`` module naming:
``encoder.subsample.conv_layers.N``, ``encoder.transformer_layers.N.*``,
``decoder.prenet.0.layers.N.0`` / ``decoder.prenet.1`` (Prenet+proj
Sequential), ``decoder.transformer_layers.N.{self_attn,encoder_attn,...}``,
``decoder.{feat_proj,eos_proj,ctc_proj,pos_emb_alpha}``,
``decoder.postnet.convolutions.N.{0,1}`` (conv + BatchNorm),
``aux_{asr,st}_decoder.{embed_tokens,layers.N,layer_norm,
output_projection}``) into this framework's param pytree, and exports back.

Layout transforms: torch Linear (out,in) -> ours (in,out) [transpose];
torch Conv1d (Cout,Cin,K) -> ours (K,Cin,Cout); LayerNorm weight->scale;
BatchNorm running stats land in the ``stats`` tree.

``checkpoint_utils.load_model_ensemble_and_task`` wraps the state dict
under ``["model"]``; plain generator checkpoints are accepted too.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _lin(sd, prefix, out):
    out["w"] = sd.pop(prefix + ".weight").T.copy()
    if prefix + ".bias" in sd:
        out["b"] = sd.pop(prefix + ".bias")
    return out


def _ln(sd, prefix):
    return {"scale": sd.pop(prefix + ".weight"),
            "bias": sd.pop(prefix + ".bias")}


def _conv(sd, prefix):
    p = {"w": np.transpose(sd.pop(prefix + ".weight"), (2, 1, 0)).copy()}
    if prefix + ".bias" in sd:
        p["b"] = sd.pop(prefix + ".bias")
    return p


def _mha(sd, prefix):
    return {
        "q": _lin(sd, prefix + ".q_proj", {}),
        "k": _lin(sd, prefix + ".k_proj", {}),
        "v": _lin(sd, prefix + ".v_proj", {}),
        "out": _lin(sd, prefix + ".out_proj", {}),
    }


def _enc_layer(sd, prefix):
    return {
        "self_attn": _mha(sd, prefix + ".self_attn"),
        "self_attn_ln": _ln(sd, prefix + ".self_attn_layer_norm"),
        "fc1": _lin(sd, prefix + ".fc1", {}),
        "fc2": _lin(sd, prefix + ".fc2", {}),
        "final_ln": _ln(sd, prefix + ".final_layer_norm"),
    }


def _dec_layer(sd, prefix):
    return {
        "self_attn": _mha(sd, prefix + ".self_attn"),
        "self_attn_ln": _ln(sd, prefix + ".self_attn_layer_norm"),
        "cross_attn": _mha(sd, prefix + ".encoder_attn"),
        "cross_attn_ln": _ln(sd, prefix + ".encoder_attn_layer_norm"),
        "fc1": _lin(sd, prefix + ".fc1", {}),
        "fc2": _lin(sd, prefix + ".fc2", {}),
        "final_ln": _ln(sd, prefix + ".final_layer_norm"),
    }


def _count(sd, pat):
    ids = {int(m.group(1)) for k in sd
           for m in [re.match(pat, k)] if m}
    return max(ids) + 1 if ids else 0


def _map_speech_encoder(sd) -> Dict[str, Any]:
    """Conv1dSubsampler + transformer speech encoder (shared by the fork's
    S2ST encoder and fairseq's S2TTransformerEncoder — identical naming:
    encoder.subsample.conv_layers.N / encoder.transformer_layers.N /
    encoder.layer_norm)."""
    enc: Dict[str, Any] = {"subsample": {}}
    n_convs = _count(sd, r"encoder\.subsample\.conv_layers\.(\d+)\.weight")
    for i in range(n_convs):
        enc["subsample"][f"conv{i}"] = _conv(
            sd, f"encoder.subsample.conv_layers.{i}")
    n_enc = _count(sd, r"encoder\.transformer_layers\.(\d+)\.fc1\.weight")
    for i in range(n_enc):
        enc[f"layer{i}"] = _enc_layer(sd, f"encoder.transformer_layers.{i}")
    if "encoder.layer_norm.weight" in sd:
        enc["final_ln"] = _ln(sd, "encoder.layer_norm")
    for name in ("aux_asr_norm", "aux_st_norm"):
        if f"encoder.{name}.weight" in sd:
            enc[name] = _ln(sd, f"encoder.{name}")
    if "encoder.embed_speaker.weight" in sd:
        enc["embed_speaker"] = {"w": sd.pop("encoder.embed_speaker.weight")}
    return enc


def _map_postnet(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Tacotron2 Postnet: conv (idx 0) + batchnorm (idx 1) per block
    (fairseq/models/text_to_speech/tacotron2.py Postnet naming)."""
    post: Dict[str, Any] = {}
    post_stats: Dict[str, Any] = {}
    n_post = _count(sd, re.escape(prefix) + r"\.convolutions\.(\d+)\.0\.weight")
    for i in range(n_post):
        pre = f"{prefix}.convolutions.{i}"
        post[f"conv{i}"] = _conv(sd, pre + ".0")
        post[f"bn{i}"] = {"scale": sd.pop(pre + ".1.weight"),
                          "bias": sd.pop(pre + ".1.bias")}
        post_stats[f"bn{i}"] = {
            "mean": sd.pop(pre + ".1.running_mean"),
            "var": sd.pop(pre + ".1.running_var"),
            "count": np.asarray(
                sd.pop(pre + ".1.num_batches_tracked", 0), np.int32),
        }
    return post, post_stats


def _map_spectrogram_decoder(sd, prefix="decoder"
                             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """The fork's TTS decoder (S2ST/T2S share it: s2st_transformer.py
    TTSTransformerDecoder naming). Returns (decoder params, postnet stats)."""
    dec: Dict[str, Any] = {"prenet": {}}
    n_pre = _count(sd, re.escape(prefix) + r"\.prenet\.0\.layers\.(\d+)\.0\.weight")
    for i in range(n_pre):
        dec["prenet"][f"fc{i}"] = _lin(sd, f"{prefix}.prenet.0.layers.{i}.0",
                                       {})
    dec["prenet_proj"] = _lin(sd, f"{prefix}.prenet.1", {})
    dec["pos_emb_alpha"] = sd.pop(f"{prefix}.pos_emb_alpha")
    n_dec = _count(sd, re.escape(prefix) + r"\.transformer_layers\.(\d+)\.fc1\.weight")
    for i in range(n_dec):
        dec[f"layer{i}"] = _dec_layer(sd, f"{prefix}.transformer_layers.{i}")
    if f"{prefix}.layer_norm.weight" in sd:
        dec["final_ln"] = _ln(sd, f"{prefix}.layer_norm")
    dec["feat_proj"] = _lin(sd, f"{prefix}.feat_proj", {})
    dec["eos_proj"] = _lin(sd, f"{prefix}.eos_proj", {})
    if f"{prefix}.ctc_proj.weight" in sd:
        dec["ctc_proj"] = _lin(sd, f"{prefix}.ctc_proj", {})
    if f"{prefix}.ctc_proj_tgt.weight" in sd:
        dec["ctc_proj_tgt"] = _lin(sd, f"{prefix}.ctc_proj_tgt", {})
    if f"{prefix}.embed_speaker.weight" in sd:
        dec["embed_speaker"] = {"w": sd.pop(f"{prefix}.embed_speaker.weight")}
    dec["postnet"], post_stats = _map_postnet(sd, f"{prefix}.postnet")
    return dec, post_stats


def _map_text_decoder(sd, which) -> Dict[str, Any]:
    """fairseq TransformerDecoder naming (embed_tokens/layers.N/layer_norm/
    output_projection) -> our aux-decoder tree (aux_decode layout)."""
    aux: Dict[str, Any] = {
        "embed": {"w": sd.pop(f"{which}.embed_tokens.weight")}}
    n_aux = _count(sd, re.escape(which) + r"\.layers\.(\d+)\.fc1\.weight")
    for i in range(n_aux):
        aux[f"layer{i}"] = _dec_layer(sd, f"{which}.layers.{i}")
    if f"{which}.layer_norm.weight" in sd:
        aux["final_ln"] = _ln(sd, f"{which}.layer_norm")
    aux["out_proj"] = {
        "w": sd.pop(f"{which}.output_projection.weight").T.copy()}
    return aux


def from_fairseq_state_dict(sd: Dict[str, np.ndarray]
                            ) -> Dict[str, Any]:
    """fairseq state dict (numpy values) -> {"params", "stats"} trees.
    Consumes keys as it maps them; leftover keys are logged."""
    sd = dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["encoder"] = _map_speech_encoder(sd)

    # --- spectrogram decoder ---
    dec, post_stats = _map_spectrogram_decoder(sd, "decoder")
    stats["postnet"] = post_stats
    params["decoder"] = dec

    # --- aux text decoders ---
    for which in ("aux_asr_decoder", "aux_st_decoder"):
        if f"{which}.embed_tokens.weight" not in sd:
            continue
        params[which] = _map_text_decoder(sd, which)

    # hubert lives in its own checkpoint normally; accept inline too
    hub_keys = [k for k in sd if k.startswith("hubert.")]
    if hub_keys:
        from .hubert import load_torch_hubert  # noqa: F401  (doc pointer)
        logger.info(f"{len(hub_keys)} hubert.* keys present; load them via "
                    "models.hubert.load_torch_hubert on the hubert ckpt")
        for k in hub_keys:
            sd.pop(k)

    leftover = [k for k in sd if not k.endswith("_float_tensor")
                and "version" not in k]
    if leftover:
        logger.warning(f"unmapped checkpoint keys: {leftover[:10]}"
                       f"{'...' if len(leftover) > 10 else ''}")
    return {"params": params, "stats": stats}


def load_fairseq_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pt checkpoint into {"params","stats"} trees."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state)
    sd = {k: v.detach().float().numpy() if torch.is_tensor(v)
          else np.asarray(v, np.float32) for k, v in sd.items()}
    return from_fairseq_state_dict(sd)


def _warn_leftover(sd, what):
    # only the sinusoidal positional-embedding BUFFER is silently fine to
    # drop; a learned embed_positions.weight must surface in the warning
    leftover = [k for k in sd if not k.endswith("_float_tensor")
                and "version" not in k]
    if leftover:
        logger.warning(f"unmapped {what} checkpoint keys: {leftover[:10]}"
                       f"{'...' if len(leftover) > 10 else ''}")


def s2t_from_fairseq_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """fairseq s2t_transformer checkpoint (speech_to_text/s2t_transformer.py:
    Conv1dSubsampler encoder + TransformerDecoder) -> our S2T tree
    (models/s2t_transformer.py: shared speech encoder + aux-style decoder)."""
    sd = dict(sd)
    params = {"encoder": _map_speech_encoder(sd),
              "decoder": _map_text_decoder(sd, "decoder")}
    _warn_leftover(sd, "s2t")
    return {"params": params, "stats": {}}


def t2s_from_fairseq_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Fork t2s_transformer checkpoint (examples/s2s_trans/models/
    t2s_transformer.py: token embed -> conv-BN-ReLU prenet -> transformer
    encoder; shared TTS decoder) -> our T2S tree (models/t2s_transformer.py).
    BatchNorm running stats land under stats["encoder"]."""
    sd = dict(sd)
    enc: Dict[str, Any] = {
        "embed_tokens": {"w": sd.pop("encoder.embed_tokens.weight")},
        "prenet_proj": _lin(sd, "encoder.prenet_proj", {}),
        "pos_emb_alpha": sd.pop("encoder.pos_emb_alpha"),
    }
    enc_stats: Dict[str, Any] = {}
    n_pre = _count(sd, r"encoder\.prenet\.(\d+)\.0\.weight")
    for i in range(n_pre):
        pre = f"encoder.prenet.{i}"
        enc[f"conv{i}"] = _conv(sd, pre + ".0")
        enc[f"bn{i}"] = {"scale": sd.pop(pre + ".1.weight"),
                         "bias": sd.pop(pre + ".1.bias")}
        enc_stats[f"bn{i}"] = {
            "mean": sd.pop(pre + ".1.running_mean"),
            "var": sd.pop(pre + ".1.running_var"),
            "count": np.asarray(
                sd.pop(pre + ".1.num_batches_tracked", 0), np.int32),
        }
    n_enc = _count(sd, r"encoder\.transformer_layers\.(\d+)\.fc1\.weight")
    for i in range(n_enc):
        enc[f"layer{i}"] = _enc_layer(sd, f"encoder.transformer_layers.{i}")
    if "encoder.layer_norm.weight" in sd:
        enc["final_ln"] = _ln(sd, "encoder.layer_norm")
    if "encoder.embed_speaker.weight" in sd:
        enc["embed_speaker"] = {"w": sd.pop("encoder.embed_speaker.weight")}
    if "encoder.spk_emb_proj.weight" in sd:
        enc["spk_proj"] = _lin(sd, "encoder.spk_emb_proj", {})

    dec, post_stats = _map_spectrogram_decoder(sd, "decoder")
    _warn_leftover(sd, "t2s")
    return {"params": {"encoder": enc, "decoder": dec},
            "stats": {"encoder": enc_stats, "postnet": post_stats}}


def _map_fft_layer(sd, prefix) -> Dict[str, Any]:
    """fastspeech2.py FFTLayer: self_attn + post-LN, conv FFN
    (ffn.ffn.0 / ffn.ffn.2 Conv1d) + post-LN."""
    return {
        "self_attn": _mha(sd, prefix + ".self_attn"),
        "attn_ln": _ln(sd, prefix + ".layer_norm"),
        "conv1": _conv(sd, prefix + ".ffn.ffn.0"),
        "conv2": _conv(sd, prefix + ".ffn.ffn.2"),
        "ffn_ln": _ln(sd, prefix + ".ffn.layer_norm"),
    }


def _map_var_predictor(sd, prefix) -> Dict[str, Any]:
    return {
        "conv1": _conv(sd, prefix + ".conv1.0"),
        "ln1": _ln(sd, prefix + ".ln1"),
        "conv2": _conv(sd, prefix + ".conv2.0"),
        "ln2": _ln(sd, prefix + ".ln2"),
        "proj": _lin(sd, prefix + ".proj", {}),
    }


def fs2_from_fairseq_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """fairseq fastspeech2 checkpoint (text_to_speech/fastspeech2.py:
    FastSpeech2Encoder under "encoder.", optional top-level ctc_proj) ->
    our FS2 tree (models/fastspeech2.py). pos_emb_alpha buffers are
    torch.ones(1); ours are scalars — reshaped here."""
    sd = dict(sd)
    p: Dict[str, Any] = {
        "embed": {"w": sd.pop("encoder.embed_tokens.weight")},
        "pos_emb_alpha": sd.pop("encoder.pos_emb_alpha").reshape(()),
        "dec_pos_emb_alpha": sd.pop("encoder.dec_pos_emb_alpha").reshape(()),
    }
    n_enc = _count(sd, r"encoder\.encoder_fft_layers\.(\d+)\.layer_norm\.weight")
    p["enc_layers"] = [_map_fft_layer(sd, f"encoder.encoder_fft_layers.{i}")
                       for i in range(n_enc)]
    n_dec = _count(sd, r"encoder\.decoder_fft_layers\.(\d+)\.layer_norm\.weight")
    p["dec_layers"] = [_map_fft_layer(sd, f"encoder.decoder_fft_layers.{i}")
                       for i in range(n_dec)]
    va = "encoder.var_adaptor"
    p["dur_pred"] = _map_var_predictor(sd, va + ".duration_predictor")
    p["pitch_pred"] = _map_var_predictor(sd, va + ".pitch_predictor")
    p["energy_pred"] = _map_var_predictor(sd, va + ".energy_predictor")
    p["embed_pitch"] = {"w": sd.pop(va + ".embed_pitch.weight")}
    p["embed_energy"] = {"w": sd.pop(va + ".embed_energy.weight")}
    p["out_proj"] = _lin(sd, "encoder.out_proj", {})
    stats: Dict[str, Any] = {}
    if "encoder.postnet.convolutions.0.0.weight" in sd:
        p["postnet"], stats["postnet"] = _map_postnet(sd, "encoder.postnet")
    if "encoder.embed_speaker.weight" in sd:
        p["embed_speaker"] = {"w": sd.pop("encoder.embed_speaker.weight")}
    if "encoder.spk_emb_proj.weight" in sd:
        p["spk_proj"] = _lin(sd, "encoder.spk_emb_proj", {})
    if "ctc_proj.weight" in sd:
        p["ctc_proj"] = _lin(sd, "ctc_proj", {})
    _warn_leftover(sd, "fastspeech2")
    return {"params": p, "stats": stats}


def transformer_text_from_fairseq_state_dict(
        sd: Dict[str, np.ndarray], share_all_embeddings: bool = False,
        share_decoder_input_output_embed: bool = False) -> Dict[str, Any]:
    """fairseq text TransformerModel checkpoint (models/transformer/:
    encoder.embed_tokens + encoder.layers.N + encoder.layer_norm;
    decoder.embed_tokens + decoder.layers.N + decoder.layer_norm +
    decoder.output_projection) -> our transformer_text tree.

    Tied checkpoints carry the shared tensor under every torch name
    (embed_tokens AND output_projection point at one Parameter); here the
    tree stores it once and ``transformer_text.decoder_view`` derives the
    views, so shared duplicates are verified equal and dropped."""
    sd = dict(sd)
    enc: Dict[str, Any] = {
        "embed": {"w": sd.pop("encoder.embed_tokens.weight")}}
    n_enc = _count(sd, r"encoder\.layers\.(\d+)\.fc1\.weight")
    for i in range(n_enc):
        enc[f"layer{i}"] = _enc_layer(sd, f"encoder.layers.{i}")
    if "encoder.layer_norm.weight" in sd:
        enc["final_ln"] = _ln(sd, "encoder.layer_norm")
    if "encoder.layernorm_embedding.weight" in sd:
        enc["embed_ln"] = _ln(sd, "encoder.layernorm_embedding")

    dec = _map_text_decoder(sd, "decoder")
    if "decoder.layernorm_embedding.weight" in sd:
        dec["embed_ln"] = _ln(sd, "decoder.layernorm_embedding")
    if share_all_embeddings:
        if not np.allclose(dec["embed"]["w"], enc["embed"]["w"]):
            raise ValueError("share_all_embeddings set but encoder/decoder "
                             "embeddings differ in the checkpoint")
        dec.pop("embed")
    if share_decoder_input_output_embed or share_all_embeddings:
        tied_src = enc["embed"]["w"] if share_all_embeddings \
            else dec["embed"]["w"]
        if not np.allclose(dec["out_proj"]["w"], tied_src.T):
            raise ValueError("tied output projection differs from the "
                             "embedding in the checkpoint")
        dec.pop("out_proj")
    _warn_leftover(sd, "transformer")
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def nat_from_fairseq_state_dict(
        sd: Dict[str, np.ndarray], share_all_embeddings: bool = True,
        share_decoder_input_output_embed: bool = False) -> Dict[str, Any]:
    """fairseq NAT/CMLM checkpoint (fairseq/models/nat/ — a text
    TransformerModel plus the decoder's length head
    ``decoder.embed_length.weight``) -> our nat_transformer tree."""
    sd = dict(sd)
    embed_length = {"w": sd.pop("decoder.embed_length.weight")}
    tree = transformer_text_from_fairseq_state_dict(
        sd, share_all_embeddings=share_all_embeddings,
        share_decoder_input_output_embed=share_decoder_input_output_embed)
    tree["params"]["decoder"]["embed_length"] = embed_length
    return tree


def lev_from_fairseq_state_dict(
        sd: Dict[str, np.ndarray], share_all_embeddings: bool = False,
        share_decoder_input_output_embed: bool = False) -> Dict[str, Any]:
    """fairseq levenshtein_transformer checkpoint -> our tree: the text
    TransformerModel plus ``decoder.embed_mask_ins`` / ``embed_word_del``
    head tables and optional separate ``decoder.layers_msk/layers_del``
    trunks."""
    sd = dict(sd)
    heads = {"embed_mask_ins": {"w": sd.pop("decoder.embed_mask_ins.weight")},
             "embed_word_del": {"w": sd.pop("decoder.embed_word_del.weight")}}
    extra = {}
    for which in ("layers_msk", "layers_del"):
        n = _count(sd, re.escape(f"decoder.{which}") + r"\.(\d+)\.fc1\.weight")
        for i in range(n):
            extra[f"{which}{i}"] = _dec_layer(sd, f"decoder.{which}.{i}")
    tree = transformer_text_from_fairseq_state_dict(
        sd, share_all_embeddings=share_all_embeddings,
        share_decoder_input_output_embed=share_decoder_input_output_embed)
    tree["params"]["decoder"].update(heads)
    tree["params"]["decoder"].update(extra)
    return tree


def _lstm_block(sd, prefix):
    """torch LSTM/LSTMCell params (w_ih/w_hh 4H blocks) kept in torch
    layout (our lstm_cell multiplies by .T)."""
    out = {}
    for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        ours = name.replace("weight", "w").replace("bias", "b")
        out[ours] = sd.pop(f"{prefix}.{name}")
    return out


def lstm_from_fairseq_state_dict(sd: Dict[str, np.ndarray],
                                 share_all_embeddings: bool = False,
                                 share_decoder_input_output_embed:
                                 bool = False) -> Dict[str, Any]:
    """fairseq/models/lstm.py checkpoint -> our LSTM tree (torch-layout
    gate blocks preserved)."""
    sd = dict(sd)
    enc: Dict[str, Any] = {
        "embed": {"w": sd.pop("encoder.embed_tokens.weight")}}
    n_enc = _count(sd, r"encoder\.lstm\.weight_ih_l(\d+)$")
    for k in range(n_enc):
        enc[f"l{k}"] = {
            "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}"),
            "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}"),
            "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}"),
            "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}"),
        }
        if f"encoder.lstm.weight_ih_l{k}_reverse" in sd:
            enc[f"l{k}_rev"] = {
                "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}_reverse"),
                "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}_reverse"),
                "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}_reverse"),
                "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}_reverse"),
            }
    dec: Dict[str, Any] = {}
    if "decoder.embed_tokens.weight" in sd:
        w = sd.pop("decoder.embed_tokens.weight")
        if not share_all_embeddings:
            dec["embed"] = {"w": w}
    n_dec = _count(sd, r"decoder\.layers\.(\d+)\.weight_ih$")
    for k in range(n_dec):
        dec[f"cell{k}"] = _lstm_block(sd, f"decoder.layers.{k}")
    for ours, theirs in (("enc_hidden_proj", "decoder.encoder_hidden_proj"),
                         ("enc_cell_proj", "decoder.encoder_cell_proj"),
                         ("attn_input_proj", "decoder.attention.input_proj"),
                         ("attn_output_proj",
                          "decoder.attention.output_proj"),
                         ("additional_fc", "decoder.additional_fc"),
                         ("fc_out", "decoder.fc_out")):
        if f"{theirs}.weight" in sd:
            dec[ours] = _lin(sd, theirs, {})
    _warn_leftover(sd, "lstm")
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


def transformer_lm_from_fairseq_state_dict(
        sd: Dict[str, np.ndarray],
        share_decoder_input_output_embed: bool = False) -> Dict[str, Any]:
    """fairseq transformer_lm checkpoint (TransformerDecoder with
    no_encoder_attn: decoder.embed_tokens + decoder.layers.N with the
    encoder-layer param set + decoder.layer_norm + output_projection) ->
    our transformer_lm tree."""
    sd = dict(sd)
    dec: Dict[str, Any] = {
        "embed": {"w": sd.pop("decoder.embed_tokens.weight")}}
    n = _count(sd, r"decoder\.layers\.(\d+)\.fc1\.weight")
    for i in range(n):
        dec[f"layer{i}"] = _enc_layer(sd, f"decoder.layers.{i}")
    if "decoder.layer_norm.weight" in sd:
        dec["final_ln"] = _ln(sd, "decoder.layer_norm")
    if "decoder.output_projection.weight" in sd:
        w = sd.pop("decoder.output_projection.weight").T.copy()
        if share_decoder_input_output_embed:
            if not np.allclose(w, dec["embed"]["w"].T):
                raise ValueError("tied output projection differs from the "
                                 "embedding in the checkpoint")
        else:
            dec["out_proj"] = {"w": w}
    _warn_leftover(sd, "transformer_lm")
    return {"params": {"decoder": dec}, "stats": {}}


def tacotron2_from_fairseq_state_dict(sd: Dict[str, np.ndarray]
                                      ) -> Dict[str, Any]:
    """fairseq/models/text_to_speech/tacotron2.py checkpoint -> our
    tacotron2 tree. LSTM/LSTMCell gate blocks stay torch-layout; the
    reference's never-applied ``ctc_proj`` (see models/tacotron2.py
    docstring) is dropped if present."""
    sd = dict(sd)
    enc: Dict[str, Any] = {
        "embed_tokens": {"w": sd.pop("encoder.embed_tokens.weight")}}
    stats: Dict[str, Any] = {}
    n_conv = _count(sd, r"encoder\.convolutions\.(\d+)\.0\.weight")
    for i in range(n_conv):
        pre = f"encoder.convolutions.{i}"
        enc[f"conv{i}"] = _conv(sd, pre + ".0")
        enc[f"bn{i}"] = {"scale": sd.pop(pre + ".1.weight"),
                         "bias": sd.pop(pre + ".1.bias")}
        stats[f"enc_bn{i}"] = {
            "mean": sd.pop(pre + ".1.running_mean"),
            "var": sd.pop(pre + ".1.running_var"),
            "count": np.asarray(
                sd.pop(pre + ".1.num_batches_tracked", 0), np.int32)}
    n_lstm = _count(sd, r"encoder\.lstm\.weight_ih_l(\d+)$")
    for k in range(n_lstm):
        enc[f"l{k}"] = {
            "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}"),
            "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}"),
            "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}"),
            "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}")}
        enc[f"l{k}_rev"] = {
            "w_ih": sd.pop(f"encoder.lstm.weight_ih_l{k}_reverse"),
            "w_hh": sd.pop(f"encoder.lstm.weight_hh_l{k}_reverse"),
            "b_ih": sd.pop(f"encoder.lstm.bias_ih_l{k}_reverse"),
            "b_hh": sd.pop(f"encoder.lstm.bias_hh_l{k}_reverse")}
    if "encoder.embed_speaker.weight" in sd:
        enc["embed_speaker"] = {"w": sd.pop("encoder.embed_speaker.weight")}
        enc["spk_emb_proj"] = _lin(sd, "encoder.spk_emb_proj", {})

    dec: Dict[str, Any] = {"prenet": {}}
    n_pre = _count(sd, r"decoder\.prenet\.layers\.(\d+)\.0\.weight")
    for i in range(n_pre):
        dec["prenet"][f"fc{i}"] = _lin(sd, f"decoder.prenet.layers.{i}.0", {})
    dec["attention_lstm"] = _lstm_block(sd, "decoder.attention_lstm.lstm_cell")
    dec["attn_proj_enc"] = _lin(sd, "decoder.attention.proj_enc", {})
    dec["attn_proj_dec"] = _lin(sd, "decoder.attention.proj_dec", {})
    dec["attn_proj_attn"] = _lin(sd, "decoder.attention.proj_attn", {})
    dec["attn_conv"] = _conv(sd, "decoder.attention.conv")
    dec["attn_proj_out"] = _lin(sd, "decoder.attention.proj_out.1", {})
    n_lstm_dec = _count(sd, r"decoder\.lstm\.(\d+)\.lstm_cell\.weight_ih$")
    for i in range(n_lstm_dec):
        dec[f"lstm{i}"] = _lstm_block(sd, f"decoder.lstm.{i}.lstm_cell")
    dec["feat_proj"] = _lin(sd, "decoder.feat_proj", {})
    dec["eos_proj"] = _lin(sd, "decoder.eos_proj", {})
    dec["postnet"], stats["postnet"] = _map_postnet(sd, "decoder.postnet")
    sd.pop("decoder.ctc_proj.weight", None)
    sd.pop("decoder.ctc_proj.bias", None)
    _warn_leftover(sd, "tacotron2")
    return {"params": {"encoder": enc, "decoder": dec}, "stats": stats}


# ---------------------------------------------------------------------------
# export (ours -> fairseq names); inverse of the above
# ---------------------------------------------------------------------------

def _unlin(p, prefix, sd):
    sd[prefix + ".weight"] = np.asarray(p["w"]).T.copy()
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _unln(p, prefix, sd):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _unconv(p, prefix, sd):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (2, 1, 0)).copy()
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _unmha(p, prefix, sd):
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("out", "out_proj")):
        _unlin(p[ours], f"{prefix}.{theirs}", sd)


def _undec_layer(p, prefix, sd):
    _unmha(p["self_attn"], prefix + ".self_attn", sd)
    _unln(p["self_attn_ln"], prefix + ".self_attn_layer_norm", sd)
    _unmha(p["cross_attn"], prefix + ".encoder_attn", sd)
    _unln(p["cross_attn_ln"], prefix + ".encoder_attn_layer_norm", sd)
    _unlin(p["fc1"], prefix + ".fc1", sd)
    _unlin(p["fc2"], prefix + ".fc2", sd)
    _unln(p["final_ln"], prefix + ".final_layer_norm", sd)


def to_fairseq_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    params = variables["params"]
    stats = variables["stats"]
    sd: Dict[str, np.ndarray] = {}

    enc = params["encoder"]
    for name, p in enc["subsample"].items():
        i = int(name[4:])
        _unconv(p, f"encoder.subsample.conv_layers.{i}", sd)
    for name, p in enc.items():
        if name.startswith("layer") and name != "layer_norm":
            i = int(name[5:])
            pre = f"encoder.transformer_layers.{i}"
            _unmha(p["self_attn"], pre + ".self_attn", sd)
            _unln(p["self_attn_ln"], pre + ".self_attn_layer_norm", sd)
            _unlin(p["fc1"], pre + ".fc1", sd)
            _unlin(p["fc2"], pre + ".fc2", sd)
            _unln(p["final_ln"], pre + ".final_layer_norm", sd)
    if "final_ln" in enc:
        _unln(enc["final_ln"], "encoder.layer_norm", sd)
    for name in ("aux_asr_norm", "aux_st_norm"):
        if name in enc:
            _unln(enc[name], f"encoder.{name}", sd)
    if "embed_speaker" in enc:
        sd["encoder.embed_speaker.weight"] = np.asarray(
            enc["embed_speaker"]["w"])

    dec = params["decoder"]
    for name, p in dec["prenet"].items():
        i = int(name[2:])
        _unlin(p, f"decoder.prenet.0.layers.{i}.0", sd)
    _unlin(dec["prenet_proj"], "decoder.prenet.1", sd)
    sd["decoder.pos_emb_alpha"] = np.asarray(dec["pos_emb_alpha"])
    for name, p in dec.items():
        if name.startswith("layer") and name != "layer_norm":
            i = int(name[5:])
            _undec_layer(p, f"decoder.transformer_layers.{i}", sd)
    if "final_ln" in dec:
        _unln(dec["final_ln"], "decoder.layer_norm", sd)
    _unlin(dec["feat_proj"], "decoder.feat_proj", sd)
    _unlin(dec["eos_proj"], "decoder.eos_proj", sd)
    for name in ("ctc_proj", "ctc_proj_tgt"):
        if name in dec:
            _unlin(dec[name], f"decoder.{name}", sd)
    if "embed_speaker" in dec:
        sd["decoder.embed_speaker.weight"] = np.asarray(
            dec["embed_speaker"]["w"])
    for name, p in dec["postnet"].items():
        if name.startswith("conv"):
            i = int(name[4:])
            _unconv(p, f"decoder.postnet.convolutions.{i}.0", sd)
        elif name.startswith("bn"):
            i = int(name[2:])
            pre = f"decoder.postnet.convolutions.{i}.1"
            sd[pre + ".weight"] = np.asarray(p["scale"])
            sd[pre + ".bias"] = np.asarray(p["bias"])
            st = stats["postnet"][f"bn{i}"]
            sd[pre + ".running_mean"] = np.asarray(st["mean"])
            sd[pre + ".running_var"] = np.asarray(st["var"])
            sd[pre + ".num_batches_tracked"] = np.asarray(st["count"])

    for which in ("aux_asr_decoder", "aux_st_decoder"):
        if which not in params:
            continue
        aux = params[which]
        sd[f"{which}.embed_tokens.weight"] = np.asarray(aux["embed"]["w"])
        for name, p in aux.items():
            if name.startswith("layer") and name != "layer_norm":
                i = int(name[5:])
                _undec_layer(p, f"{which}.layers.{i}", sd)
        if "final_ln" in aux:
            _unln(aux["final_ln"], f"{which}.layer_norm", sd)
        sd[f"{which}.output_projection.weight"] = np.asarray(
            aux["out_proj"]["w"]).T.copy()
    return sd
