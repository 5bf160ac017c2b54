"""The s2s_translation task: wires config -> dictionaries -> datasets ->
model -> loss -> speech generator -> validation-with-inference.

Parity: ``examples/s2s_trans/tasks/s2s_translation.py`` —
``setup_task`` loads src+tgt dictionaries from the data config (:92-119),
``load_dataset`` builds S2STDataset via the creator (:121-144),
``build_generator_tts`` + default vocoder (:186-215), and
``valid_step_with_inference`` computing MCD via batched DTW (:240-264).

TPU-native: validation inference is one jitted program (AR while_loop +
on-device MFCC/DTW); the task owns no device state — it builds configs and
host-side data plumbing only.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..data.data_cfg import S2STDataConfig
from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator
from ..data.s2st_dataset import S2STDataset, S2STDatasetCreator
from ..registry import register_task

logger = logging.getLogger(__name__)


@register_task("s2s_translation")
class S2STranslationTask:
    def __init__(self, args, data_cfg: S2STDataConfig,
                 src_dict: Dictionary, tgt_dict: Dictionary):
        self.args = args
        self.data_cfg = data_cfg
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.datasets: Dict[str, S2STDataset] = {}
        self.speaker_to_id = (json.loads(args.speaker_to_id)
                              if getattr(args, "speaker_to_id", None) else None)

    # ------------------------------------------------------------------
    @classmethod
    def setup_task(cls, args) -> "S2STranslationTask":
        data_cfg = S2STDataConfig(Path(args.data) / args.config_yaml)
        data_cfg.set_use_hubert(args.use_hubert)

        def load_dict(fname):
            path = Path(args.data) / fname
            if not path.is_file():
                raise FileNotFoundError(f"Dict not found: {path}")
            return Dictionary.load(str(path))

        src_dict = load_dict(data_cfg.src_vocab_filename)
        tgt_dict = load_dict(data_cfg.tgt_vocab_filename)
        logger.info(f"src dictionary size: {len(src_dict)}; "
                    f"tgt dictionary size: {len(tgt_dict)}")
        return cls(args, data_cfg, src_dict, tgt_dict)

    # ------------------------------------------------------------------
    def load_dataset(self, split: str) -> S2STDataset:
        is_train = split.startswith("train")
        ds = S2STDatasetCreator.from_tsv(
            self.args.data, self.data_cfg, split, self.src_dict,
            self.tgt_dict, is_train,
            n_frames_per_step=self.args.n_frames_per_step,
            speaker_to_id=self.speaker_to_id,
            seed=getattr(self.args, "seed", 1))
        self.datasets[split] = ds
        return ds

    def get_batch_iterator(self, split: str, max_tokens: int,
                           max_sentences: Optional[int] = None,
                           seed: int = 1, num_shards: int = 1,
                           shard_id: int = 0, shuffle: bool = True,
                           data_rank: int = 0, data_world: int = 1
                           ) -> EpochBatchIterator:
        if split not in self.datasets:
            self.load_dataset(split)
        max_pos = None
        if getattr(self.args, "skip_invalid_size_inputs_valid_test", False):
            max_pos = getattr(self.args, "max_source_positions", None)
        return EpochBatchIterator(
            self.datasets[split], max_tokens=max_tokens,
            max_sentences=max_sentences, seed=seed, num_shards=num_shards,
            shard_id=shard_id, shuffle=shuffle,
            required_batch_size_multiple=getattr(
                self.args, "required_batch_size_multiple", 1),
            max_positions=max_pos,
            data_rank=data_rank, data_world=data_world,
            num_workers=getattr(self.args, "num_workers", 0),
            num_batch_buckets=getattr(self.args, "num_batch_buckets", 0))

    # ------------------------------------------------------------------
    def build_model_config(self):
        from ..options import build_model_config
        num_speakers = (max(self.speaker_to_id.values()) + 1
                        if self.speaker_to_id else 0)
        cfg = build_model_config(self.args, len(self.src_dict),
                                 len(self.tgt_dict), num_speakers)
        feat = self.data_cfg.input_feat_per_channel
        if feat != cfg.input_feat_per_channel:
            cfg = cfg.replace(input_feat_per_channel=feat)
        return cfg

    def build_loss_config(self):
        from ..options import build_loss_config
        return build_loss_config(self.args)

    def build_model_and_loss(self):
        """arch -> (model_cfg, init_fn(key)->variables, loss_fn).

        loss_fn has the uniform signature (variables, cfg, lcfg, batch, rng,
        train) used by the Trainer. Mirrors the reference's arch/criterion
        registry dispatch (models/__init__.py:55 + criterions registry)."""
        import functools
        from ..train import losses as L
        arch = getattr(self.args, "arch", "s2st_transformer")
        base = self.build_model_config()
        if arch.startswith("t2s_transformer"):
            from ..models import t2s_transformer as t2s
            cfg = t2s.T2SConfig(
                base=base,
                encoder_conv_layers=self.args.encoder_conv_layers,
                encoder_conv_kernel_size=self.args.encoder_conv_kernel_size,
                encoder_dropout=self.args.encoder_dropout,
                encoder_transformer_layers=self.args.encoder_transformer_layers)
            return cfg, functools.partial(t2s.init_t2s, cfg=cfg), L.t2s_loss
        if arch in ("tacotron_2", "tacotron2"):
            from ..models import tacotron2 as tc2
            a = self.args
            cfg = tc2.Tacotron2Config(
                vocab_size=len(self.src_dict),
                encoder_dropout=a.encoder_dropout,
                encoder_embed_dim=a.encoder_embed_dim,
                encoder_conv_layers=a.encoder_conv_layers,
                encoder_conv_kernel_size=a.encoder_conv_kernel_size,
                encoder_lstm_layers=getattr(a, "encoder_lstm_layers", 1),
                attention_dim=getattr(a, "attention_dim", 128),
                attention_conv_dim=getattr(a, "attention_conv_dim", 32),
                attention_conv_kernel_size=getattr(
                    a, "attention_conv_kernel_size", 15),
                prenet_dropout=a.prenet_dropout,
                prenet_layers=a.prenet_layers,
                prenet_dim=a.prenet_dim,
                postnet_dropout=a.postnet_dropout,
                postnet_layers=a.postnet_layers,
                postnet_conv_dim=a.postnet_conv_dim,
                postnet_conv_kernel_size=a.postnet_conv_kernel_size,
                init_attn_c=getattr(a, "init_attn_c", "zero"),
                attention_use_cumprob=getattr(
                    a, "attention_use_cumprob", True),
                zoneout=getattr(a, "zoneout", 0.1),
                decoder_lstm_layers=getattr(a, "decoder_lstm_layers", 2),
                decoder_lstm_dim=getattr(a, "decoder_lstm_dim", 1024),
                output_frame_dim=base.output_frame_dim,
                n_frames_per_step=base.n_frames_per_step,
                num_speakers=base.num_speakers,
                speaker_embed_dim=a.speaker_embed_dim,
                dtype=base.dtype)
            return cfg, functools.partial(tc2.init_tacotron2, cfg=cfg), \
                L.tacotron2_loss
        if arch.startswith("fastspeech2"):
            from ..models import fastspeech2 as fs2
            a = self.args
            cfg = fs2.FS2Config(
                vocab_size=len(self.src_dict),
                output_frame_dim=base.output_frame_dim,
                n_frames_per_step=base.n_frames_per_step,
                encoder_layers=a.encoder_layers,
                encoder_embed_dim=a.encoder_embed_dim,
                encoder_attention_heads=a.encoder_attention_heads,
                decoder_layers=a.decoder_layers,
                decoder_embed_dim=a.decoder_embed_dim,
                decoder_attention_heads=a.decoder_attention_heads,
                fft_hidden_dim=getattr(a, "fft_hidden_dim", 1024),
                fft_kernel_size=getattr(a, "fft_kernel_size", 9),
                dropout=a.dropout,
                attention_dropout=a.attention_dropout,
                var_pred_n_bins=getattr(a, "var_pred_n_bins", 256),
                var_pred_hidden_dim=getattr(a, "var_pred_hidden_dim", 256),
                var_pred_kernel_size=getattr(a, "var_pred_kernel_size", 3),
                var_pred_dropout=getattr(a, "var_pred_dropout", 0.5),
                pitch_min=getattr(a, "pitch_min", 0.0),
                pitch_max=getattr(a, "pitch_max", 600.0),
                energy_min=getattr(a, "energy_min", 0.0),
                energy_max=getattr(a, "energy_max", 5.0),
                add_postnet=getattr(a, "add_postnet", False),
                postnet_layers=a.postnet_layers,
                postnet_conv_dim=a.postnet_conv_dim,
                postnet_conv_kernel_size=a.postnet_conv_kernel_size,
                postnet_dropout=a.postnet_dropout,
                speaker_embed_dim=a.speaker_embed_dim,
                num_speakers=base.num_speakers,
                ctc=base.ctc,
                max_source_positions=base.max_source_positions,
                max_target_positions=base.max_target_positions,
                dtype=base.dtype)
            return cfg, functools.partial(fs2.init_fs2, cfg=cfg), \
                L.fastspeech2_loss
        if arch.startswith("xm_transformer"):
            from ..models import xm_transformer as xm
            from ..models.hubert import HubertConfig
            test_type = getattr(self.args, "test_type", "st")
            vocab = len(self.src_dict) if test_type == "asr" \
                else len(self.tgt_dict)
            a = self.args
            trunk = HubertConfig(encoder_embed_dim=a.hubert_hidden,
                                 encoder_layers=a.hubert_layers,
                                 encoder_ffn_embed_dim=a.hubert_ffn,
                                 encoder_attention_heads=a.hubert_heads,
                                 dtype=base.dtype)
            cfg = xm.XMConfig(
                trunk=trunk, vocab_size=vocab,
                decoder_layers=a.decoder_layers,
                decoder_embed_dim=a.decoder_embed_dim,
                decoder_ffn_embed_dim=a.decoder_ffn_embed_dim,
                decoder_attention_heads=a.decoder_attention_heads,
                adaptor_n_layers=getattr(a, "adaptor_n_layers", 3),
                adaptor_kernel_size=getattr(a, "adaptor_kernel_size", 3),
                adaptor_stride=getattr(a, "adaptor_stride", 2),
                adaptor_layernorm=getattr(a, "adaptor_layernorm", False),
                dropout=a.dropout,
                attention_dropout=a.attention_dropout,
                activation_dropout=a.activation_dropout,
                max_target_positions=min(a.max_target_positions, 1024),
                dtype=base.dtype)
            loss = functools.partial(L.s2t_loss, test_type=test_type,
                                     forward_module="xm")
            loss.mean_keys = L.s2t_loss.mean_keys
            return cfg, functools.partial(xm.init_xm, cfg=cfg), loss
        if arch.startswith("s2t_berard"):
            import ast
            from ..models import berard as brd
            test_type = getattr(self.args, "test_type", "st")
            vocab = len(self.src_dict) if test_type == "asr" \
                else len(self.tgt_dict)
            a = self.args
            cfg = brd.BerardConfig(
                vocab_size=vocab,
                input_feat_per_channel=base.input_feat_per_channel,
                input_layers=tuple(ast.literal_eval(
                    str(getattr(a, "input_layers", "[256, 128]")))),
                conv_layers=tuple(tuple(t) for t in ast.literal_eval(
                    str(getattr(a, "conv_layers",
                                "[(16, 3, 2), (16, 3, 2)]")))),
                num_blstm_layers=getattr(a, "num_blstm_layers", 3),
                lstm_size=getattr(a, "lstm_size", 256),
                decoder_embed_dim=a.decoder_embed_dim,
                decoder_num_layers=getattr(a, "decoder_num_layers", 2),
                decoder_hidden_dim=getattr(a, "decoder_hidden_dim", 512),
                attention_dim=getattr(a, "attention_dim", 512),
                output_layer_dim=getattr(a, "output_layer_dim", 128),
                dropout=a.dropout, dtype=base.dtype)
            loss = functools.partial(L.s2t_loss, test_type=test_type,
                                     forward_module="berard")
            loss.mean_keys = L.s2t_loss.mean_keys
            return cfg, functools.partial(brd.init_berard, cfg=cfg), loss
        if arch.startswith("convtransformer"):
            from ..models import convtransformer as ct
            test_type = getattr(self.args, "test_type", "st")
            vocab = len(self.src_dict) if test_type == "asr" \
                else len(self.tgt_dict)
            cfg = ct.ConvTransformerConfig(
                base=base,
                conv_out_channels=getattr(self.args, "conv_out_channels",
                                          256),
                decoder_layers=self.args.decoder_layers,
                decoder_embed_dim=self.args.decoder_embed_dim)
            loss = functools.partial(L.s2t_loss, test_type=test_type,
                                     forward_module="convtransformer")
            loss.mean_keys = L.s2t_loss.mean_keys
            return cfg, functools.partial(
                ct.init_convtransformer, cfg=cfg, vocab_size=vocab), loss
        if arch.startswith("s2t_transformer"):
            from ..models import s2t_transformer as s2t
            test_type = getattr(self.args, "test_type", "st")
            vocab = len(self.src_dict) if test_type == "asr" \
                else len(self.tgt_dict)
            cfg = s2t.S2TConfig(
                base=base,
                decoder_layers=self.args.decoder_layers,
                decoder_embed_dim=self.args.decoder_embed_dim)
            loss = functools.partial(L.s2t_loss, test_type=test_type)
            loss.mean_keys = L.s2t_loss.mean_keys
            return cfg, functools.partial(s2t.init_s2t, cfg=cfg,
                                          vocab_size=vocab), loss
        from ..models import s2st_transformer as s2st_m
        return base, functools.partial(s2st_m.init_s2st, cfg=base), \
            L.s2st_loss


    # ------------------------------------------------------------------
    # validation with inference (MCD)
    # ------------------------------------------------------------------

    def gcmvn_stats(self):
        """(mean, std) of the target GCMVN transform or (None, None)."""
        path = self.data_cfg.tgt_global_cmvn_stats_npz
        if path is None:
            return None, None
        stats = np.load(path)
        return stats["mean"].astype(np.float32), stats["std"].astype(np.float32)

    def build_vocoder(self):
        from ..generate.vocoder import get_vocoder
        return get_vocoder(self.args, self.data_cfg)

    def build_eval_inference_fn(self, model_cfg, max_iter: int = 500,
                                eos_prob_threshold: float = 0.5):
        """Returns a jittable fn(variables, src_speech, src_speech_lens,
        tgt_speech, target_lengths) -> MCD sums dict. The whole chain —
        AR decode, mel->linear, Griffin-Lim, MFCC, DTW — is one XLA program
        (reference: python loop + CPU DTW, tasks/s2s_translation.py:240-264).
        """
        import jax
        import jax.numpy as jnp
        from ..generate.speech_generator import (GenerationConfig,
                                                 generate_features)
        from ..ops import dsp
        from ..ops.mcd import batch_mcd

        gen_cfg = GenerationConfig(max_iter=max_iter,
                                   eos_prob_threshold=eos_prob_threshold,
                                   prenet_dropout_at_inference=True)
        gcmvn_mean, gcmvn_std = self.gcmvn_stats()
        feats_cfg = self.data_cfg.features or {}
        sr = int(feats_cfg.get("sample_rate", 16000))
        n_fft = int(feats_cfg.get("n_fft", 1024))
        hop = int(feats_cfg.get("hop_length", 256))
        win = int(feats_cfg.get("win_length", n_fft))
        n_mels = int(feats_cfg.get("n_mels", 80))
        f_min = float(feats_cfg.get("f_min", 20.0))
        f_max = float(feats_cfg.get("f_max", sr // 2))
        gl_iters = int(getattr(self.args, "spec_bwd_max_iter", 8))
        pinv = dsp.make_pinv_mel_basis(sr, n_fft, n_mels, f_min, f_max)

        def fn(variables, src_speech, src_speech_lens, tgt_speech,
               target_lengths, rng):
            out = generate_features(variables, model_cfg, gen_cfg,
                                    src_speech, src_speech_lens, rng=rng,
                                    gcmvn_mean=gcmvn_mean, gcmvn_std=gcmvn_std)
            pred_lin = dsp.logmel_to_linear(out["feats"], pinv)
            pred_wave = dsp.griffin_lim(pred_lin, n_fft, win, hop, gl_iters,
                                        jax.random.fold_in(rng, 1))
            # istft yields (T-1)*hop samples for T frames
            pred_wlen = jnp.maximum(out["raw_out_lens"] - 1, 0) * hop
            # target: denormalized mel -> wave via the same vocoder path
            tgt = tgt_speech.astype(jnp.float32).reshape(
                tgt_speech.shape[0], -1, model_cfg.output_frame_dim)
            if gcmvn_mean is not None:
                tgt = tgt * jnp.asarray(gcmvn_std) + jnp.asarray(gcmvn_mean)
            tgt_lin = dsp.logmel_to_linear(tgt, pinv)
            tgt_wave = dsp.griffin_lim(tgt_lin, n_fft, win, hop, gl_iters,
                                       jax.random.fold_in(rng, 2))
            tgt_wlen = jnp.maximum(
                target_lengths * model_cfg.n_frames_per_step - 1, 0) * hop
            sums = batch_mcd(pred_wave, pred_wlen, tgt_wave, tgt_wlen, sr)
            # first-utterance panels for tensorboard
            # (tasks/s2s_translation.py:266-310 audio/spectrogram logging)
            sums["example_wave"] = pred_wave[0]
            sums["example_wave_len"] = pred_wlen[0]
            sums["example_feats"] = out["feats"][0]
            sums["example_attn"] = out["attn"][0]
            return sums

        fn.sample_rate = sr
        return fn


@register_task("s2s_translation_mtl")
class S2STranslationMTLTask(S2STranslationTask):
    """Legacy MTL task variant (examples/s2s_trans/tasks/
    s2s_translation_mtl.py:39): same data plumbing; the model/criterion
    differences (decoder taps + src/tgt CTC, no HuBERT/aux decoders) come
    from --arch s2st_transformer_mtl + --ctc-weight-tgt."""
