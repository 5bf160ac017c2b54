"""Composite S2ST training loss (parity: examples/s2s_trans/criterions/s2st_loss.py).

All terms are computed with static shapes + masks (no boolean indexing):
  L1 + MSE on pre-/post-postnet features over valid frames (:294-315),
  EOS BCE with positive-class weight (:311-314),
  guided attention (:106-144), CTC over encoder tap 0 (:228-243),
  label-smoothed CE for the aux ASR/ST decoders normalized by their own
  token counts and weights (:244-257).

Everything returns fp32 scalars; ``reduce='mean'`` semantics follow torch
(mean over selected elements).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..nn.core import lengths_to_mask, split_rngs
from ..models import s2st_transformer as m

PAD = m.PAD


@dataclass(frozen=True)
class LossConfig:
    """Mirrors Tacotron2CriterionConfig (s2st_loss.py:52-103) + recipe flags."""
    bce_pos_weight: float = 5.0          # recipe: --bce-pos-weight 5.0
    use_guided_attention_loss: bool = False
    guided_attention_loss_sigma: float = 0.4
    label_smoothing: float = 0.1         # recipe: --label-smoothing 0.1
    ctc_weight: float = 0.0
    ctc_weight_tgt: float = 0.0          # MTL: tgt CTC over decoder tap
    asr_ce_weight: float = 0.0
    st_ce_weight: float = 0.0
    l1_loss_weight: float = 1.0
    mse_loss_weight: float = 1.0
    eos_loss_weight: float = 1.0
    attn_loss_weight: float = 1.0
    alignment_lambda: float = 0.05      # --alignment-lambda (transformer_align)
    sentence_avg: bool = False
    nsp_loss_weight: float = 1.0        # legacy_masked_lm NSP term weight
    masked_lm_only: bool = False


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask (broadcastable) is True."""
    mask = jnp.broadcast_to(mask, x.shape)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / denom


def label_smoothed_nll_loss(lprobs: jnp.ndarray, target: jnp.ndarray,
                            epsilon: float, ignore_index: int = PAD
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum-reduced label-smoothed NLL (s2st_loss.py:33-50).
    lprobs: (N, V) fp32 log-probs; target: (N,) int."""
    nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    keep = target != ignore_index
    nll = jnp.where(keep, nll, 0.0)
    smooth = jnp.where(keep, smooth, 0.0)
    nll_sum = jnp.sum(nll)
    smooth_sum = jnp.sum(smooth)
    eps_i = epsilon / (lprobs.shape[-1] - 1)
    loss = (1.0 - epsilon - eps_i) * nll_sum + eps_i * smooth_sum
    return loss, nll_sum


def guided_attention_loss(attn_ts: jnp.ndarray, src_lens: jnp.ndarray,
                          tgt_lens: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """attn_ts: (B, Tt, Ts) fp32 cross-attention probabilities.

    Vectorized over the batch (the reference loops per sample with an
    lru_cache of weight grids — here one broadcasted computation)."""
    b, tt, ts = attn_ts.shape
    t_idx = jnp.arange(tt, dtype=jnp.float32)[None, :, None]   # (1,Tt,1)
    s_idx = jnp.arange(ts, dtype=jnp.float32)[None, None, :]   # (1,1,Ts)
    s_len = src_lens.astype(jnp.float32)[:, None, None]
    t_len = tgt_lens.astype(jnp.float32)[:, None, None]
    w = (s_idx / s_len - t_idx / t_len) ** 2
    weights = 1.0 - jnp.exp(-w / (2.0 * sigma ** 2))
    mask = (lengths_to_mask(tgt_lens, tt)[:, :, None]
            & lengths_to_mask(src_lens, ts)[:, None, :])
    return masked_mean(weights * attn_ts, mask)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: float, mask: jnp.ndarray) -> jnp.ndarray:
    """torch binary_cross_entropy_with_logits(pos_weight=w) parity, masked mean."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return masked_mean(loss, mask)


def s2st_loss(variables: Dict[str, Any], cfg: m.S2STConfig, lcfg: LossConfig,
              batch: Dict[str, Any], rng: Optional[jax.Array] = None,
              train: bool = True, forward_fn=None
              ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Returns (total loss fp32 scalar, extras).

    extras: {"new_stats", "logging": {per-term fp32 scalars}, "sample_size"}.

    forward_fn: model forward override (the Trainer injects a pipeline-
    parallel forward when the mesh has a stage axis)."""
    fwd = forward_fn if forward_fn is not None else m.forward
    net = fwd(variables, cfg, batch, rng=rng,
              deterministic=not train, train=train)
    return _composite_loss(net, cfg, lcfg, batch)


s2st_loss.supports_forward_fn = True


def t2s_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
             batch: Dict[str, Any], rng: Optional[jax.Array] = None,
             train: bool = True) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Tacotron2 loss for the T2S model (registered ``t2s_loss``,
    t2s_loss.py:91 parity): same spectrogram terms, no CTC/aux decoders.
    cfg: t2s_transformer.T2SConfig."""
    from ..models import t2s_transformer as t2s
    net = t2s.forward(variables, cfg, batch, rng=rng,
                      deterministic=not train, train=train)
    return _composite_loss(net, cfg.base, lcfg, batch)


def s2t_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
             batch: Dict[str, Any], rng: Optional[jax.Array] = None,
             train: bool = True, test_type: str = "st",
             forward_module: str = "s2t"
             ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Label-smoothed CE for ST/ASR pretraining (registered ``s2t_loss``,
    s2t_loss.py:57 parity; test_type picks asr=src_text vs st=tgt_text
    targets, :88-94). cfg: s2t_transformer.S2TConfig (or the
    ConvTransformerConfig via forward_module="convtransformer")."""
    if forward_module == "convtransformer":
        from ..models import convtransformer as s2t
    elif forward_module == "berard":
        from ..models import berard as s2t
    elif forward_module == "xm":
        from ..models import xm_transformer as s2t
    else:
        from ..models import s2t_transformer as s2t
    b = {**batch}
    if test_type == "asr":
        b["prev_text_tokens"] = batch["prev_src_text_tokens"]
        tgt = batch["src_text"]
        ntokens = jnp.asarray(batch["src_txt_ntokens"], jnp.float32)
    else:
        b["prev_text_tokens"] = batch["prev_tgt_text_tokens"]
        tgt = batch["tgt_text"]
        ntokens = jnp.asarray(batch["tgt_txt_ntokens"], jnp.float32)
    net = s2t.forward(variables, cfg, b, rng=rng,
                      deterministic=not train, train=train)
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    loss_sum, nll_sum = label_smoothed_nll_loss(
        lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
    sample_size = jnp.where(lcfg.sentence_avg, tgt.shape[0],
                            ntokens.astype(jnp.int32))
    pred = jnp.argmax(lp, axis=-1)
    keep = tgt != PAD
    logging = {
        # fairseq convention: CE losses logged in base-2 per-sample-size
        "loss": loss_sum / jnp.maximum(ntokens, 1.0),
        "nll_loss": nll_sum / jnp.maximum(ntokens, 1.0),
        "n_correct": jnp.sum((pred == tgt) & keep),
        "total": jnp.sum(keep),
        "ntokens": ntokens,
        "nsentences": jnp.int32(tgt.shape[0]),
        "sample_size": sample_size,
    }
    # trainer normalizes summed grads by sample_size, so return the SUM here
    # (label_smoothed_cross_entropy parity: loss is sum-reduced)
    return loss_sum, {"new_stats": net["new_stats"], "logging": logging,
                      "sample_size": sample_size}


def _composite_loss(net: Dict[str, Any], cfg: m.S2STConfig, lcfg: LossConfig,
                    batch: Dict[str, Any]
                    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    tgt_feat = batch["tgt_speech"].astype(jnp.float32)        # (B, Tt, D)
    tgt_lens = batch["target_lengths"]                        # (B,)
    b, tt, d = tgt_feat.shape
    frame_mask = lengths_to_mask(tgt_lens, tt)                # (B, Tt)
    fmask3 = frame_mask[:, :, None]

    feat_out = net["feat_out"].astype(jnp.float32)
    post_feat_out = net["post_feat_out"].astype(jnp.float32)
    eos_out = net["eos_out"].astype(jnp.float32)[:, :, 0]

    # EOS target: 1 at the last valid frame (s2st_loss.py:184-187)
    pos = jnp.arange(tt)[None, :]
    eos_tgt = (pos == (tgt_lens[:, None] - 1)).astype(jnp.float32)

    l1 = (masked_mean(jnp.abs(feat_out - tgt_feat), fmask3)
          + masked_mean(jnp.abs(post_feat_out - tgt_feat), fmask3))
    mse = (masked_mean((feat_out - tgt_feat) ** 2, fmask3)
           + masked_mean((post_feat_out - tgt_feat) ** 2, fmask3))
    eos = bce_with_logits(eos_out, eos_tgt, lcfg.bce_pos_weight, frame_mask)

    attn_loss = jnp.float32(0.0)
    if lcfg.use_guided_attention_loss and net["attn"] is not None:
        attn_loss = guided_attention_loss(
            net["attn"].astype(jnp.float32), net["encoder_out_lengths"],
            tgt_lens, lcfg.guided_attention_loss_sigma)

    ctc = jnp.float32(0.0)
    if lcfg.ctc_weight > 0.0 and "ctc_logits" in net:
        logits = net["ctc_logits"].astype(jnp.float32)        # (B, Ts', V)
        logit_pad = net["encoder_padding_mask"].astype(jnp.float32)
        labels = batch["src_text"]                            # (B, N) int32
        label_pad = (jnp.arange(labels.shape[1])[None, :]
                     >= batch["src_text_len"][:, None]).astype(jnp.float32)
        per_ex = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                blank_id=0)
        # torch CTCLoss(reduction='mean'): per-example nll / label_len, then
        # batch mean (s2st_loss.py:242-243)
        per_ex = per_ex / jnp.maximum(batch["src_text_len"].astype(jnp.float32), 1.0)
        ctc = jnp.mean(per_ex) * lcfg.ctc_weight

    ctc_tgt = jnp.float32(0.0)
    if lcfg.ctc_weight_tgt > 0.0 and "ctc_tgt_logits" in net:
        # MTL tgt-side CTC over a decoder middle-layer tap
        # (s2st_loss_mtl.py:171-183): logit lengths = target frame lengths
        logits_t = net["ctc_tgt_logits"].astype(jnp.float32)  # (B, Tt, V)
        logit_pad_t = (jnp.arange(logits_t.shape[1])[None, :]
                       >= tgt_lens[:, None]).astype(jnp.float32)
        labels_t = batch["tgt_text"]
        label_pad_t = (jnp.arange(labels_t.shape[1])[None, :]
                       >= batch["tgt_text_len"][:, None]).astype(jnp.float32)
        per_ex_t = optax.ctc_loss(logits_t, logit_pad_t, labels_t,
                                  label_pad_t, blank_id=0)
        per_ex_t = per_ex_t / jnp.maximum(
            batch["tgt_text_len"].astype(jnp.float32), 1.0)
        ctc_tgt = jnp.mean(per_ex_t) * lcfg.ctc_weight_tgt

    logging: Dict[str, Any] = {}
    aux_asr = jnp.float32(0.0)
    if lcfg.asr_ce_weight > 0.0 and "asr_logits" in net:
        lp = jax.nn.log_softmax(net["asr_logits"].astype(jnp.float32), axis=-1)
        tgt = batch["src_text"]
        loss_sum, nll = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
        aux_asr = loss_sum / jnp.maximum(batch["src_txt_ntokens"], 1) * lcfg.asr_ce_weight
        pred = jnp.argmax(lp, axis=-1)
        keep = tgt != PAD
        logging["asr_n_correct"] = jnp.sum((pred == tgt) & keep)
        logging["asr_total"] = jnp.sum(keep)

    aux_st = jnp.float32(0.0)
    if lcfg.st_ce_weight > 0.0 and "st_logits" in net:
        lp = jax.nn.log_softmax(net["st_logits"].astype(jnp.float32), axis=-1)
        tgt = batch["tgt_text"]
        loss_sum, nll = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
        aux_st = loss_sum / jnp.maximum(batch["tgt_txt_ntokens"], 1) * lcfg.st_ce_weight
        pred = jnp.argmax(lp, axis=-1)
        keep = tgt != PAD
        logging["st_n_correct"] = jnp.sum((pred == tgt) & keep)
        logging["st_total"] = jnp.sum(keep)

    l1 = l1 * lcfg.l1_loss_weight
    mse = mse * lcfg.mse_loss_weight
    eos = eos * lcfg.eos_loss_weight
    attn_loss = attn_loss * lcfg.attn_loss_weight
    loss = l1 + mse + eos + attn_loss + ctc + ctc_tgt + aux_asr + aux_st

    ntokens = jnp.sum(tgt_lens)
    sample_size = jnp.where(lcfg.sentence_avg, b, ntokens)
    logging.update({
        "loss": loss, "l1_loss": l1, "mse_loss": mse, "eos_loss": eos,
        "attn_loss": attn_loss, "ctc_loss": ctc, "ctc_loss_tgt": ctc_tgt,
        "aux_asr_loss": aux_asr, "aux_st_loss": aux_st,
        "ntokens": ntokens, "nsentences": jnp.int32(b),
        "sample_size": sample_size,
    })
    return loss, {"new_stats": net["new_stats"], "logging": logging,
                  "sample_size": sample_size}


# Which logging keys are per-microbatch MEANS (the trainer sums logging
# across grad-accum microbatches, then divides these back; count-style keys
# like ntokens/n_correct stay summed). Declared HERE, next to the dicts
# that define the keys, so a new metric can't silently get the wrong
# normalization in trainer.py.
_COMPOSITE_MEAN_KEYS = ("loss", "l1_loss", "mse_loss", "eos_loss",
                        "attn_loss", "ctc_loss", "ctc_loss_tgt",
                        "aux_asr_loss", "aux_st_loss")
s2st_loss.mean_keys = _COMPOSITE_MEAN_KEYS
t2s_loss.mean_keys = _COMPOSITE_MEAN_KEYS
s2t_loss.mean_keys = ("loss", "nll_loss")


def tacotron2_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                   batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                   train: bool = True) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Tacotron2Criterion (fairseq/criterions/tacotron2_loss.py:91-182):
    masked-mean L1 + MSE on pre/post-postnet features, pos-weighted EOS
    BCE, optional guided attention — the same terms as the composite
    spectrogram loss. cfg: tacotron2.Tacotron2Config. The reference's CTC
    branch is a dead path (see models/tacotron2.py docstring) and is not
    reproduced."""
    from ..models import tacotron2 as tc2
    net = tc2.forward(variables, cfg, batch, rng=rng,
                      deterministic=not train, train=train)
    # model attn is reference-shaped (B, Ts, Tt); the composite loss
    # (like the reference criterion's attn.transpose(1, 2)) wants (B,Tt,Ts)
    net = dict(net)
    net["attn"] = net["attn"].transpose(0, 2, 1)
    return _composite_loss(net, cfg, lcfg, batch)


tacotron2_loss.mean_keys = _COMPOSITE_MEAN_KEYS


def translation_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                     batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                     train: bool = True
                     ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Label-smoothed CE over a text translation batch (registered as
    ``label_smoothed_cross_entropy`` / ``cross_entropy``; parity:
    fairseq/criterions/label_smoothed_cross_entropy.py — sum-reduced loss,
    sample_size = ntokens unless --sentence-avg).

    cfg: transformer_text.TransformerTextConfig (or lstm.LSTMConfig —
    dispatched by config type). ntokens is computed in-graph from the pad
    mask (identical to the collated count: every non-pad target token,
    including EOS) so padded snap rows cost nothing.
    """
    from ..models import fconv as fconv_m
    from ..models import lightconv_model as lc
    from ..models import lstm as lstm_m
    from ..models import transformer_text as tt
    if isinstance(cfg, lstm_m.LSTMConfig):
        fwd = lstm_m.forward
    elif isinstance(cfg, lc.LightConvConfig):
        fwd = lc.forward
    elif isinstance(cfg, fconv_m.FConvConfig):
        fwd = fconv_m.forward
    else:
        fwd = tt.forward
    net = fwd(variables, cfg, batch, rng=rng,
              deterministic=not train, train=train)
    tgt = batch["target"]
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    loss_sum, nll_sum = label_smoothed_nll_loss(
        lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
    keep = tgt != PAD
    ntokens = jnp.sum(keep).astype(jnp.float32)
    nsent = jnp.sum(jnp.any(keep, axis=1)).astype(jnp.int32)
    sample_size = jnp.where(lcfg.sentence_avg, nsent,
                            ntokens.astype(jnp.int32))
    pred = jnp.argmax(lp, axis=-1)
    logging = {
        "loss": loss_sum / jnp.maximum(ntokens, 1.0),
        "nll_loss": nll_sum / jnp.maximum(ntokens, 1.0),
        "n_correct": jnp.sum((pred == tgt) & keep),
        "total": jnp.sum(keep),
        "ntokens": ntokens,
        "nsentences": nsent,
        "sample_size": sample_size,
    }
    return loss_sum, {"new_stats": net["new_stats"], "logging": logging,
                      "sample_size": sample_size}


translation_loss.mean_keys = ("loss", "nll_loss")


def translation_alignment_loss(variables: Dict[str, Any], cfg,
                               lcfg: LossConfig, batch: Dict[str, Any],
                               rng: Optional[jax.Array] = None,
                               train: bool = True
                               ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """label_smoothed_cross_entropy_with_alignment (criterions/
    label_smoothed_cross_entropy_with_alignment.py:39-91): LS-CE +
    alignment_lambda * sum over aligned (src, tgt) pairs of
    -log(attn[tgt_flat, src]) * (1/freq of the tgt index).

    cfg: transformer_align.TransformerAlignConfig. batch carries
    ``alignments`` (A, 2) int32 [src_col, tgt_flat_row] padded pairs and
    ``align_weights`` (A,) fp32 with 0 at padding (so padded pairs are
    exactly free)."""
    from ..models import transformer_align as ta
    net = ta.forward(variables, cfg, batch, rng=rng,
                     deterministic=not train, train=train)
    tgt = batch["target"]
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    loss_sum, nll_sum = label_smoothed_nll_loss(
        lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
    keep = tgt != PAD
    ntokens = jnp.sum(keep).astype(jnp.float32)
    nsent = jnp.sum(jnp.any(keep, axis=1)).astype(jnp.int32)
    sample_size = jnp.where(lcfg.sentence_avg, nsent,
                            ntokens.astype(jnp.int32))

    align_loss = jnp.float32(0.0)
    if "alignments" in batch:
        attn = net["attn"].astype(jnp.float32)           # (B, Tt, Ts)
        b_, tt_, ts_ = attn.shape
        flat = attn.reshape(b_ * tt_, ts_)
        pairs = batch["alignments"]                      # (A, 2) src, tgtflat
        w = batch["align_weights"].astype(jnp.float32)   # (A,)
        probs = flat[pairs[:, 1], pairs[:, 0]]
        # clamp keeps padded (0,0) lookups finite; their weight is 0
        align_loss = -jnp.sum(jnp.log(jnp.maximum(probs, 1e-20)) * w)

    total = loss_sum + lcfg.alignment_lambda * align_loss
    logging = {
        "loss": total / jnp.maximum(ntokens, 1.0),
        "nll_loss": nll_sum / jnp.maximum(ntokens, 1.0),
        "alignment_loss": align_loss / jnp.maximum(ntokens, 1.0),
        "ntokens": ntokens, "nsentences": nsent,
        "sample_size": sample_size,
    }
    return total, {"new_stats": net["new_stats"], "logging": logging,
                   "sample_size": sample_size}


translation_alignment_loss.mean_keys = ("loss", "nll_loss",
                                        "alignment_loss")


def multilingual_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                      batch: Dict[str, Any],
                      rng: Optional[jax.Array] = None, train: bool = True
                      ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """multilingual_translation train/valid step (fairseq/tasks/
    multilingual_translation.py:428-474): one batch per language pair per
    update, per-pair label-smoothed CE summed into a single loss;
    logging keeps per-pair `{pair}:` metrics plus the summed aggregates.
    cfg: multilingual_transformer.MultilingualConfig;
    batch: {"pairs": {pair: langpair-batch}}."""
    from ..models import multilingual_transformer as mt
    pairs_batch = batch["pairs"]
    total = jnp.float32(0.0)
    logging: Dict[str, Any] = {}
    agg = {"loss": 0.0, "nll_loss": 0.0, "ntokens": 0.0,
           "nsentences": 0, "sample_size": 0, "n_correct": 0, "total": 0}
    for i, pair in enumerate(cfg.lang_pairs):
        if pair not in pairs_batch:
            continue
        sub = pairs_batch[pair]
        r = jax.random.fold_in(rng, i) if rng is not None else None
        net = mt.forward(variables, cfg, sub, pair, rng=r,
                         deterministic=not train, train=train)
        lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
        tgt = sub["target"]
        loss_sum, nll_sum = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1),
            lcfg.label_smoothing)
        keep = tgt != PAD
        ntok = jnp.sum(keep)
        nsent = jnp.sum(jnp.any(keep, axis=1))
        ssize = jnp.where(lcfg.sentence_avg, nsent, ntok)
        pred = jnp.argmax(lp, axis=-1)
        logging[f"{pair}:loss"] = loss_sum / jnp.maximum(ntok, 1)
        logging[f"{pair}:nll_loss"] = nll_sum / jnp.maximum(ntok, 1)
        total = total + loss_sum
        agg["loss"] = agg["loss"] + loss_sum
        agg["nll_loss"] = agg["nll_loss"] + nll_sum
        agg["ntokens"] = agg["ntokens"] + ntok
        agg["nsentences"] = agg["nsentences"] + nsent
        agg["sample_size"] = agg["sample_size"] + ssize
        agg["n_correct"] = agg["n_correct"] + jnp.sum((pred == tgt) & keep)
        agg["total"] = agg["total"] + jnp.sum(keep)
    ntok = jnp.maximum(agg["ntokens"], 1.0)
    logging.update({
        "loss": agg["loss"] / ntok, "nll_loss": agg["nll_loss"] / ntok,
        "ntokens": agg["ntokens"], "nsentences": agg["nsentences"],
        "sample_size": agg["sample_size"], "n_correct": agg["n_correct"],
        "total": agg["total"]})
    return total, {"new_stats": {}, "logging": logging,
                   "sample_size": agg["sample_size"]}


multilingual_loss.mean_keys = ("loss", "nll_loss")


def semisupervised_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                        batch: Dict[str, Any],
                        rng: Optional[jax.Array] = None, train: bool = True,
                        *, parallel_pairs=(), bt_beam: int = 1,
                        bt_max_len_a: float = 1.1,
                        bt_max_len_b: float = 10.0
                        ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """semisupervised_translation train step (fairseq/tasks/
    semisupervised_translation.py:398-456): parallel CE + on-the-fly
    back-translation (reverse-model decode under stop_gradient, INSIDE
    this jitted loss) + tgt-tgt denoising reconstruction, each scaled by
    its lambda (batch scalars). cfg: MultilingualConfig whose lang_pairs
    include the reverse and tgt-tgt directions."""
    from ..generate.sequence_generator import BeamConfig, beam_search_aux
    from ..models import multilingual_transformer as mt
    from ..models import transformer_text as tt
    pairs_batch = batch["pairs"]
    lam_par = batch.get("lambda_parallel", jnp.float32(1.0))
    lam_bt = batch.get("lambda_otf_bt", jnp.float32(0.0))
    lam_dn = batch.get("lambda_denoising", jnp.float32(0.0))
    total = jnp.float32(0.0)
    logging: Dict[str, Any] = {}
    agg = {"loss": 0.0, "nll_loss": 0.0, "ntokens": 0.0, "nsentences": 0,
           "sample_size": 0}

    def ce(view_pair, sub, weight, key, r):
        nonlocal total
        net = mt.forward(variables, cfg, sub, view_pair, rng=r,
                         deterministic=not train, train=train)
        lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
        tgt = sub["target"]
        loss_sum, nll_sum = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1),
            lcfg.label_smoothing)
        keep = tgt != PAD
        ntok = jnp.sum(keep)
        nsent = jnp.sum(jnp.any(keep, axis=1))
        ssize = jnp.where(lcfg.sentence_avg, nsent, ntok)
        logging[f"{key}:loss"] = loss_sum / jnp.maximum(ntok, 1)
        total = total + weight * loss_sum
        agg["loss"] = agg["loss"] + weight * loss_sum
        agg["nll_loss"] = agg["nll_loss"] + nll_sum
        agg["ntokens"] = agg["ntokens"] + ntok
        agg["nsentences"] = agg["nsentences"] + nsent
        agg["sample_size"] = agg["sample_size"] + ssize

    i = 0
    for pair in parallel_pairs:
        if pair in pairs_batch:
            r = jax.random.fold_in(rng, i) if rng is not None else None
            i += 1
            ce(pair, pairs_batch[pair], lam_par, pair, r)
    for pair in parallel_pairs:
        key = f"bt:{pair}"
        if key not in pairs_batch:
            continue
        sub = pairs_batch[key]
        src_l, tgt_l = pair.split("-")
        rev = f"{tgt_l}-{src_l}"
        view, pcfg = mt.pair_view(variables, cfg, rev)
        view = jax.tree_util.tree_map(jax.lax.stop_gradient, view)
        gen_vars = tt.generation_variables(view, pcfg)
        enc = tt.encode(view, pcfg, sub["src_tokens"],
                        deterministic=True)
        max_len = min(int(bt_max_len_a * sub["src_tokens"].shape[1]
                          + bt_max_len_b),
                      pcfg.max_target_positions - 2)
        bs = BeamConfig(beam=bt_beam, max_len=max(max_len, 2))
        r = jax.random.fold_in(rng, 1000 + i) if rng is not None \
            else jax.random.PRNGKey(0)
        i += 1
        out = beam_search_aux(
            [gen_vars], tt._aux_cfg(pcfg), "decoder",
            [enc["encoder_out"]], [enc["encoder_padding_mask"]], bs,
            src_lengths=jnp.sum(sub["src_tokens"] != PAD, axis=1), rng=r)
        tokens = out["tokens"][:, 0]                    # (B, L+2)
        lens = out["lengths"][:, 0]
        pos = jnp.arange(tokens.shape[1] - 1)[None, :]
        synth = jnp.where(pos < lens[:, None], tokens[:, 1:], PAD)
        synth = jax.lax.stop_gradient(synth.astype(jnp.int32))
        r2 = jax.random.fold_in(rng, 2000 + i) if rng is not None else None
        ce(pair, {"src_tokens": synth,
                  "prev_output_tokens": sub["prev_output_tokens"],
                  "target": sub["target"]}, lam_bt, key, r2)
    for pair in parallel_pairs:
        key = f"denoising:{pair}"
        if key not in pairs_batch:
            continue
        tgt_l = pair.split("-")[1]
        r = jax.random.fold_in(rng, 3000 + i) if rng is not None else None
        i += 1
        ce(f"{tgt_l}-{tgt_l}", pairs_batch[key], lam_dn, key, r)

    ntok = jnp.maximum(agg["ntokens"], 1.0)
    logging.update({
        "loss": agg["loss"] / ntok, "nll_loss": agg["nll_loss"] / ntok,
        "ntokens": agg["ntokens"], "nsentences": agg["nsentences"],
        "sample_size": agg["sample_size"]})
    return total, {"new_stats": {}, "logging": logging,
                   "sample_size": agg["sample_size"]}


semisupervised_loss.mean_keys = ("loss", "nll_loss")


def online_bt_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                   batch: Dict[str, Any],
                   rng: Optional[jax.Array] = None, train: bool = True,
                   *, mono_langs=(), lang_toks=(), other=()
                   ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """online_backtranslation train step (fairseq/tasks/
    online_backtranslation.py:501-547): per-language {lang}-BT (round-trip
    generation with bos = __other__ inside the jitted step, stop-gradient)
    and {lang}-DENOISE CE, weighted by the lambda_bt / lambda_dae batch
    scalars; validation batches carry the plain translation pair."""
    from ..generate.sequence_generator import BeamConfig, beam_search_aux
    from ..models import transformer_text as tt
    toks = dict(lang_toks)
    other_of = dict(other)
    pairs_batch = batch["pairs"]
    lam_bt = batch.get("lambda_bt", jnp.float32(1.0))
    lam_dae = batch.get("lambda_dae", jnp.float32(1.0))
    total = jnp.float32(0.0)
    logging: Dict[str, Any] = {}
    agg = {"loss": 0.0, "nll_loss": 0.0, "ntokens": 0.0, "nsentences": 0,
           "sample_size": 0}

    def ce(sub, weight, key, r):
        nonlocal total
        net = tt.forward(variables, cfg, sub, rng=r,
                         deterministic=not train, train=train)
        lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
        tgt = sub["target"]
        loss_sum, nll_sum = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1),
            lcfg.label_smoothing)
        keep = tgt != PAD
        ntok = jnp.sum(keep)
        nsent = jnp.sum(jnp.any(keep, axis=1))
        ssize = jnp.where(lcfg.sentence_avg, nsent, ntok)
        logging[f"{key}:loss"] = loss_sum / jnp.maximum(ntok, 1)
        total = total + weight * loss_sum
        agg["loss"] = agg["loss"] + weight * loss_sum
        agg["nll_loss"] = agg["nll_loss"] + nll_sum
        agg["ntokens"] = agg["ntokens"] + ntok
        agg["nsentences"] = agg["nsentences"] + nsent
        agg["sample_size"] = agg["sample_size"] + ssize

    i = 0
    for key in sorted(pairs_batch):
        sub = pairs_batch[key]
        r = jax.random.fold_in(rng, i) if rng is not None \
            else jax.random.PRNGKey(i)
        i += 1
        if key.endswith("-BT"):
            lang = key[:-3]
            bos_tok = toks[other_of[lang]]
            view = jax.tree_util.tree_map(jax.lax.stop_gradient, variables)
            gen_vars = tt.generation_variables(view, cfg)
            enc = tt.encode(view, cfg, sub["src_tokens"],
                            deterministic=True)
            max_len = min(int(1.3 * sub["src_tokens"].shape[1] + 5),
                          cfg.max_target_positions - 2)
            bs = BeamConfig(beam=1, max_len=max(max_len, 6), min_len=5,
                            bos=bos_tok)
            out = beam_search_aux(
                [gen_vars], tt._aux_cfg(cfg), "decoder",
                [enc["encoder_out"]], [enc["encoder_padding_mask"]], bs,
                src_lengths=jnp.sum(sub["src_tokens"] != PAD, axis=1),
                rng=r)
            tokens = out["tokens"][:, 0]
            lens = out["lengths"][:, 0]
            # new source = __other__ + hypothesis (bt:461-470)
            pos = jnp.arange(tokens.shape[1])[None, :]
            synth = jnp.where((pos >= 1) & (pos <= lens[:, None]),
                              tokens, PAD).astype(jnp.int32)
            synth = synth.at[:, 0].set(bos_tok)
            synth = jax.lax.stop_gradient(synth)
            ce({"src_tokens": synth,
                "prev_output_tokens": sub["prev_output_tokens"],
                "target": sub["target"]}, lam_bt, key, r)
        elif key.endswith("-DENOISE"):
            ce(sub, lam_dae, key, r)
        else:
            ce(sub, jnp.float32(1.0), key, r)

    ntok = jnp.maximum(agg["ntokens"], 1.0)
    logging.update({
        "loss": agg["loss"] / ntok, "nll_loss": agg["nll_loss"] / ntok,
        "ntokens": agg["ntokens"], "nsentences": agg["nsentences"],
        "sample_size": agg["sample_size"]})
    return total, {"new_stats": {}, "logging": logging,
                   "sample_size": agg["sample_size"]}


online_bt_loss.mean_keys = ("loss", "nll_loss")


def lm_forward_fn(cfg):
    """LM teacher-forced forward dispatch by config type (the arch ->
    decoder-only-model mapping shared by lm_loss and eval_lm)."""
    from ..models import fconv as fconv_m
    from ..models import lightconv_model as lc_m
    from ..models import lstm as lstm_m
    from ..models import transformer_lm as tlm
    if isinstance(cfg, fconv_m.FConvConfig):
        return fconv_m.forward_lm
    if isinstance(cfg, lstm_m.LSTMConfig):
        return lstm_m.forward_lm
    if isinstance(cfg, lc_m.LightConvConfig):
        return lc_m.forward_lm
    return tlm.forward


def lm_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            train: bool = True) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Cross-entropy for language modeling (fairseq cross_entropy /
    label_smoothed_cross_entropy over MonolingualDataset batches).
    cfg: transformer_lm.TransformerLMConfig (or fconv.FConvConfig for the
    fconv_lm archs — dispatched by config type)."""
    fwd = lm_forward_fn(cfg)
    net = fwd(variables, cfg, batch, rng=rng,
              deterministic=not train, train=train)
    tgt = batch["target"]
    if "features" in net:
        # adaptive softmax (adaptive_loss criterion): band-wise CE, never
        # forming full-vocab logits
        from ..models.adaptive import adaptive_nll
        b, t, d = net["features"].shape
        nll = adaptive_nll(
            variables["params"]["decoder"]["adaptive_softmax"],
            net["features"].reshape(b * t, d), tgt.reshape(-1),
            cfg.adaptive_softmax_cutoff, cfg.vocab_size,
            net["adaptive_tied"])
        keep_flat = tgt.reshape(-1) != PAD
        loss_sum = nll_sum = jnp.sum(jnp.where(keep_flat, nll, 0.0))
    else:
        lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
        loss_sum, nll_sum = label_smoothed_nll_loss(
            lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1),
            lcfg.label_smoothing)
    keep = tgt != PAD
    ntokens = jnp.sum(keep).astype(jnp.float32)
    nsent = jnp.sum(jnp.any(keep, axis=1)).astype(jnp.int32)
    sample_size = jnp.where(lcfg.sentence_avg, nsent,
                            ntokens.astype(jnp.int32))
    logging = {
        "loss": loss_sum / jnp.maximum(ntokens, 1.0),
        "nll_loss": nll_sum / jnp.maximum(ntokens, 1.0),
        "ntokens": ntokens,
        "nsentences": nsent,
        "sample_size": sample_size,
    }
    return loss_sum, {"new_stats": net["new_stats"], "logging": logging,
                      "sample_size": sample_size}


lm_loss.mean_keys = ("loss", "nll_loss")


def masked_lm_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                   batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                   train: bool = True
                   ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Masked-LM cross-entropy over the masked positions only
    (fairseq/criterions/masked_lm.py: sample_size = masked token count;
    the reference gathers the masked rows — here a mask selects with
    static shapes). cfg: roberta.RobertaConfig."""
    from ..models import roberta
    net = roberta.forward(variables, cfg, batch, rng=rng,
                          deterministic=not train, train=train)
    tgt = batch["target"]
    keep = tgt != PAD
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    loss_sum = jnp.sum(jnp.where(keep, nll, 0.0))
    n_masked = jnp.sum(keep)
    sample_size = n_masked.astype(jnp.int32)
    logging = {
        "loss": loss_sum / jnp.maximum(n_masked, 1),
        "nll_loss": loss_sum / jnp.maximum(n_masked, 1),
        "ntokens": jnp.sum(batch["src_tokens"] != PAD),
        "nsentences": jnp.int32(tgt.shape[0]),
        "sample_size": sample_size,
    }
    return loss_sum, {"new_stats": net["new_stats"], "logging": logging,
                      "sample_size": sample_size}


masked_lm_loss.mean_keys = ("loss", "nll_loss")


def sentence_prediction_loss(variables: Dict[str, Any], cfg, lcfg,
                             batch: Dict[str, Any],
                             rng: Optional[jax.Array] = None,
                             train: bool = True
                             ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Sentence classification CE + accuracy
    (fairseq/criterions/sentence_prediction.py; sample_size =
    nsentences). Padded snap rows carry label -1 and are masked."""
    from ..models import roberta
    head = variables["params"]["classification_heads"][
        "sentence_classification_head"]
    logits = roberta.classification_forward(
        variables, cfg, head, batch["src_tokens"], rng=rng,
        deterministic=not train)
    tgt = batch["target"]
    valid = tgt >= 0
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        lp, jnp.maximum(tgt, 0)[:, None], axis=-1)[:, 0]
    loss_sum = jnp.sum(jnp.where(valid, nll, 0.0))
    n = jnp.sum(valid)
    pred = jnp.argmax(lp, axis=-1)
    logging = {
        "loss": loss_sum / jnp.maximum(n, 1),
        "n_correct": jnp.sum((pred == tgt) & valid),
        "total": n,
        "nsentences": n,
        "ntokens": jnp.sum(batch["src_tokens"] != PAD),
        "sample_size": n.astype(jnp.int32),
    }
    return loss_sum, {"new_stats": {}, "logging": logging,
                      "sample_size": n.astype(jnp.int32)}


sentence_prediction_loss.mean_keys = ("loss",)


def sentence_ranking_loss(variables: Dict[str, Any], cfg, lcfg,
                          batch: Dict[str, Any],
                          rng: Optional[jax.Array] = None,
                          train: bool = True,
                          head_name: str = "sentence_classification_head"
                          ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """SentenceRankingCriterion (fairseq/criterions/sentence_ranking.py:
    39-95): every candidate row scored by the 1-unit ranking head, NLL
    over the per-candidate softmax, sample_size = nsentences.
    batch["src_tokens_options"]: (B, C, T)."""
    from ..models import roberta
    head = variables["params"]["classification_heads"][head_name]
    opts = batch["src_tokens_options"]
    b, c, t = opts.shape
    rngs = split_rngs(rng, c)
    scores = []
    for k in range(c):
        s = roberta.classification_forward(
            variables, cfg, head, opts[:, k], rng=rngs[k],
            deterministic=not train)               # (B, 1)
        scores.append(s[:, 0])
    logits = jnp.stack(scores, axis=1)             # (B, C)
    tgt = batch["target"]
    valid = tgt >= 0
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        lp, jnp.maximum(tgt, 0)[:, None], axis=-1)[:, 0]
    loss_sum = jnp.sum(jnp.where(valid, nll, 0.0))
    n = jnp.sum(valid)
    pred = jnp.argmax(lp, axis=-1)
    logging = {
        "loss": loss_sum / jnp.maximum(n, 1),
        "n_correct": jnp.sum((pred == tgt) & valid),
        "total": n,
        "nsentences": n,
        "ntokens": jnp.sum(opts[:, 0] != PAD),
        "sample_size": n.astype(jnp.int32),
    }
    return loss_sum, {"new_stats": {}, "logging": logging,
                      "sample_size": n.astype(jnp.int32)}


sentence_ranking_loss.mean_keys = ("loss",)


def legacy_masked_lm_loss(variables: Dict[str, Any], cfg, lcfg,
                          batch: Dict[str, Any],
                          rng: Optional[jax.Array] = None,
                          train: bool = True
                          ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """legacy_masked_lm_loss (criterions/legacy_masked_lm.py:73-133):
    per-token masked-LM CE normalized IN-batch by the number of masked
    targets (sample_size = 1 — the loss is already a mean). When the batch
    carries ``sentence_target`` and the model has the NSP head
    (legacy_masked_lm task, sent_loss), the next-sentence CE is added with
    weight ``--nsp-loss-weight`` normalized by nsentences
    (:95-123); cross_lingual_lm runs masked-LM-only. cfg:
    masked_lm_xlm.MaskedLMXLMConfig."""
    from ..models import masked_lm_xlm as mx
    net = mx.forward(variables, cfg, batch, rng=rng,
                     deterministic=not train, train=train)
    tgt = batch["target"]
    keep = tgt != PAD
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    lm_loss = jnp.sum(jnp.where(keep, nll, 0.0))
    ntokens = jnp.sum(keep).astype(jnp.float32)
    loss = lm_loss / jnp.maximum(ntokens, 1.0)
    pred = jnp.argmax(lp, axis=-1)
    sentence_loss = jnp.float32(0.0)
    if (net.get("sentence_logits") is not None
            and "sentence_target" in batch
            and not getattr(lcfg, "masked_lm_only", False)):
        slp = jax.nn.log_softmax(
            net["sentence_logits"].astype(jnp.float32), axis=-1)
        st = batch["sentence_target"]
        sentence_loss = -jnp.sum(
            jnp.take_along_axis(slp, st[:, None], axis=-1)[:, 0])
        nsent = jnp.maximum(jnp.float32(st.shape[0]), 1.0)
        loss = loss + getattr(lcfg, "nsp_loss_weight", 1.0) \
            * (sentence_loss / nsent)
    logging = {
        "loss": loss,
        "lm_loss": lm_loss / jnp.maximum(ntokens, 1.0),
        "sentence_loss": sentence_loss,
        "n_correct": jnp.sum((pred == tgt) & keep),
        "total": jnp.sum(keep),
        "ntokens": ntokens,
        "nsentences": jnp.sum(jnp.any(batch["src_tokens"] != PAD, axis=1)),
        "sample_size": jnp.int32(1),
    }
    return loss, {"new_stats": {}, "logging": logging,
                  "sample_size": jnp.int32(1)}


legacy_masked_lm_loss.mean_keys = ("loss", "lm_loss", "sentence_loss")


def wav2vec_v1_loss(variables: Dict[str, Any], cfg, lcfg,
                    batch: Dict[str, Any],
                    rng: Optional[jax.Array] = None, train: bool = True,
                    penalty_weight: float = 1.0
                    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """wav2vec v1 CPC criterion (criterions/wav2vec_criterion.py through
    Wav2VecModel.get_logits/targets): sum-reduced binary CE with optional
    balanced-class weights (default), or InfoNCE CE when --infonce;
    sample_size = number of positive targets (BCE) / rows (InfoNCE)."""
    from ..models import wav2vec_v1 as w1
    net = w1.forward(variables, cfg, batch, rng=rng,
                     deterministic=not train, train=train)
    logits = net["cpc_logits"].astype(jnp.float32)
    if cfg.infonce:
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.sum(lp[:, 0])
        sample_size = jnp.int32(logits.shape[0])
        n_correct = jnp.sum(jnp.argmax(logits, axis=-1) == 0)
        total = jnp.int32(logits.shape[0])
    else:
        tgt = net["cpc_targets"].astype(jnp.float32)
        per = -(tgt * jax.nn.log_sigmoid(logits)
                + (1.0 - tgt) * jax.nn.log_sigmoid(-logits))
        if net["cpc_weights"] is not None:
            per = per * net["cpc_weights"]
        loss = jnp.sum(per)
        sample_size = jnp.sum(tgt).astype(jnp.int32)
        n_correct = jnp.sum((logits > 0) == (tgt > 0.5))
        total = jnp.int32(logits.shape[0])
    # quantizer penalty (wav2vec_criterion loss_weights: coef * p *
    # sample_size)
    if "kmeans_loss" in net:
        loss = loss + penalty_weight * net["kmeans_loss"] \
            * sample_size.astype(jnp.float32)
    logging = {
        "loss": loss / jnp.maximum(sample_size, 1),
        "n_correct": n_correct, "total": total,
        "ntokens": sample_size, "nsentences": batch["source"].shape[0],
        "sample_size": sample_size,
    }
    if "kmeans_loss" in net:
        logging["kmeans_loss"] = net["kmeans_loss"]
        logging["code_perplexity"] = net["code_perplexity"]
    return loss, {"new_stats": {}, "logging": logging,
                  "sample_size": sample_size}


wav2vec_v1_loss.mean_keys = ("loss",)


def fconv_self_att_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                        batch: Dict[str, Any],
                        rng: Optional[jax.Array] = None, train: bool = True
                        ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Label-smoothed/plain CE over the fconv_self_att stories model
    (the reference pairs it with cross_entropy)."""
    from ..models import fconv_self_att as fsa
    net = fsa.forward(variables, cfg, batch, rng=rng,
                      deterministic=not train, train=train)
    tgt = batch["target"]
    lp = jax.nn.log_softmax(net["logits"].astype(jnp.float32), axis=-1)
    loss_sum, nll_sum = label_smoothed_nll_loss(
        lp.reshape(-1, lp.shape[-1]), tgt.reshape(-1), lcfg.label_smoothing)
    keep = tgt != PAD
    ntokens = jnp.sum(keep).astype(jnp.float32)
    nsent = jnp.sum(jnp.any(keep, axis=1)).astype(jnp.int32)
    sample_size = jnp.where(lcfg.sentence_avg, nsent,
                            ntokens.astype(jnp.int32))
    logging = {
        "loss": loss_sum / jnp.maximum(ntokens, 1.0),
        "nll_loss": nll_sum / jnp.maximum(ntokens, 1.0),
        "ntokens": ntokens, "nsentences": nsent,
        "sample_size": sample_size,
    }
    return loss_sum, {"new_stats": {}, "logging": logging,
                      "sample_size": sample_size}


fconv_self_att_loss.mean_keys = ("loss", "nll_loss")


# ---------------------------------------------------------------------------
# non-autoregressive translation (translation_lev task)
# ---------------------------------------------------------------------------

def _compact_keep(tokens: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Left-compact kept tokens preserving order; dropped slots become PAD
    (the reference's double-gather in _random_delete,
    tasks/translation_lev.py:95-101)."""
    t = tokens.shape[1]
    key = jnp.where(keep, jnp.arange(t)[None, :], t + jnp.arange(t)[None, :])
    order = jnp.argsort(key, axis=1)
    gathered = jnp.take_along_axis(tokens, order, axis=1)
    n_keep = jnp.sum(keep, axis=1, keepdims=True)
    return jnp.where(jnp.arange(t)[None, :] < n_keep, gathered, PAD)


def inject_noise(target: jnp.ndarray, mode: str, rng: jax.Array
                 ) -> jnp.ndarray:
    """tasks/translation_lev.py inject_noise parity, fully in-graph.
    target: (B, T) with BOS ... EOS, right-PAD. BOS=0 EOS=2 UNK=3."""
    BOS, EOS, UNK = 0, 2, 3
    b, t = target.shape
    is_pad = target == PAD
    special = (target == BOS) | (target == EOS)
    if mode == "no_noise":
        return target
    if mode == "full_mask":
        return jnp.where(is_pad | special, target, UNK)
    r1, r2 = jax.random.split(rng)
    if mode == "random_delete":
        score = jax.random.uniform(r1, (b, t))
        score = jnp.where(special, 0.0, score)
        score = jnp.where(is_pad, 1.0, score)
        rank = jnp.argsort(jnp.argsort(score, axis=1), axis=1)
        length = jnp.sum(~is_pad, axis=1, keepdims=True)
        u = jax.random.uniform(r2, (b, 1))
        cutoff = 2 + ((length - 2).astype(jnp.float32) * u).astype(jnp.int32)
        keep = rank < cutoff                 # lowest scores survive
        return _compact_keep(target, keep & ~is_pad)
    if mode == "random_mask":
        maskable = ~(is_pad | special)
        score = jax.random.uniform(r1, (b, t))
        score = jnp.where(maskable, score, 2.0)
        rank = jnp.argsort(jnp.argsort(score, axis=1), axis=1)
        n = jnp.sum(maskable, axis=1).astype(jnp.float32)
        u = jax.random.uniform(r2, (b,))
        n_mask = (n * u + 1.0).astype(jnp.int32)[:, None]
        return jnp.where(rank < n_mask, UNK, target)
    raise ValueError(f"unknown noise {mode!r}")


def nat_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
             batch: Dict[str, Any], rng: Optional[jax.Array] = None,
             train: bool = True, noise: str = "random_mask",
             kind: str = "cmlm") -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """LabelSmoothedDualImitationCriterion (fairseq/criterions/nat_loss.py):
    word_ins = MEAN nll over the masked positions with the dual-imitation
    smoothing form nll*(1-ls) - mean(lprobs)*ls; length = mean CE * factor;
    sample_size = 1 (the reference normalizes by 1, :126-128). The scaffold
    noise (translation_lev inject_noise) is applied IN-GRAPH from rng —
    train_step AND valid_step both inject it in the reference."""
    from ..models import nat_transformer as natm
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_noise, r_model = jax.random.split(rng)
    tgt = batch["target"]
    prev_target = inject_noise(tgt, noise, r_noise)
    fwd = natm.inat_forward if cfg.train_step > 1 else natm.forward
    net = fwd(variables, cfg, {**batch, "prev_target": prev_target},
              rng=r_model, deterministic=not train, train=train)
    lp = jax.nn.log_softmax(net["word_ins_logits"].astype(jnp.float32), -1)
    loss_tgt = net.get("word_ins_tgt", tgt)   # inat stacks steps
    if kind == "cmlm":
        mask = prev_target == 3          # cmlm: only the masked positions
    else:
        mask = loss_tgt != PAD           # vanilla NAT/iNAT: every token
    nll = -jnp.take_along_axis(lp, loss_tgt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    nll_mean = jnp.sum(jnp.where(mask, nll, 0.0)) / denom
    ls = lcfg.label_smoothing
    if ls > 0:
        mean_lp = jnp.sum(jnp.where(mask[..., None], lp, 0.0)) \
            / (denom * lp.shape[-1])
        word_loss = nll_mean * (1.0 - ls) - mean_lp * ls
    else:
        word_loss = nll_mean
    # length head: mean CE over the batch * length_loss_factor
    llp = jax.nn.log_softmax(net["length_logits"], axis=-1)
    len_nll = -jnp.take_along_axis(
        llp, net["length_tgt"][:, None], axis=-1)[:, 0]
    length_loss = jnp.mean(len_nll) * cfg.length_loss_factor
    loss = word_loss + length_loss
    logging = {
        "loss": loss,
        "nll_loss": nll_mean,
        "word_ins-loss": word_loss,
        "length-loss": length_loss,
        "ntokens": jnp.sum(tgt != PAD),
        "nsentences": jnp.int32(tgt.shape[0]),
        "sample_size": jnp.int32(1),
    }
    if getattr(cfg, "crf", False):
        # NAT-CRF (nat_crf_transformer.py:66-85): word_ins is co-trained
        # at word_ins_loss_factor; the CRF nll is per-token-normalized
        # then batch-averaged
        from ..ops.crf import crf_log_likelihood
        word_mask = tgt != PAD
        crf_ll = crf_log_likelihood(
            variables["params"]["crf"], net["word_ins_logits"], tgt,
            word_mask, cfg.crf_beam_approx)
        crf_nll = jnp.mean(-crf_ll / jnp.maximum(
            jnp.sum(word_mask, axis=1).astype(jnp.float32), 1.0))
        loss = word_loss * cfg.word_ins_loss_factor + length_loss + crf_nll
        logging = {**logging, "loss": loss, "word_crf-loss": crf_nll,
                   "word_ins-loss": word_loss * cfg.word_ins_loss_factor}
    return loss, {"new_stats": net["new_stats"], "logging": logging,
                  "sample_size": jnp.int32(1)}


nat_loss.mean_keys = ("loss", "nll_loss", "word_ins-loss", "length-loss",
                      "word_crf-loss")


def _nat_term(logits: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
              ls: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One nat_loss term: MEAN nll over masked positions, dual-imitation
    smoothing (nat_loss.py:33-75). Returns (loss, nll_mean)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    nll_mean = jnp.sum(jnp.where(mask, nll, 0.0)) / denom
    if ls > 0:
        mean_lp = jnp.sum(jnp.where(mask[..., None], lp, 0.0)) \
            / (denom * lp.shape[-1])
        return nll_mean * (1.0 - ls) - mean_lp * ls, nll_mean
    return nll_mean, nll_mean


def lev_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
             batch: Dict[str, Any], rng: Optional[jax.Array] = None,
             train: bool = True, noise: str = "random_delete"
             ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """nat_loss over the Levenshtein model's three heads
    (levenshtein_transformer.py:118-138: mask_ins ls=0.01 fixed, word_ins
    ls=--label-smoothing with nll reporting, word_del plain CE).
    cfg: levenshtein_transformer.LevenshteinConfig."""
    from ..models import levenshtein_transformer as lev
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_noise, r_model = jax.random.split(rng)
    tgt = batch["target"]
    prev_target = inject_noise(tgt, noise, r_noise)
    net = lev.forward(variables, cfg,
                      {**batch, "prev_target": prev_target},
                      rng=r_model, deterministic=not train, train=train)
    ins_loss, _ = _nat_term(net["mask_ins_out"], net["mask_ins_tgt"],
                            net["mask_ins_mask"], 0.01)
    word_loss, nll = _nat_term(net["word_ins_out"], net["word_ins_tgt"],
                               net["word_ins_mask"], lcfg.label_smoothing)
    del_loss, _ = _nat_term(net["word_del_out"], net["word_del_tgt"],
                            net["word_del_mask"], 0.0)
    loss = ins_loss + word_loss + del_loss
    logging = {
        "loss": loss,
        "nll_loss": nll,
        "mask_ins-loss": ins_loss,
        "word_ins-loss": word_loss,
        "word_del-loss": del_loss,
        "ntokens": jnp.sum(tgt != PAD),
        "nsentences": jnp.int32(tgt.shape[0]),
        "sample_size": jnp.int32(1),
    }
    return loss, {"new_stats": net["new_stats"], "logging": logging,
                  "sample_size": jnp.int32(1)}


lev_loss.mean_keys = ("loss", "nll_loss", "mask_ins-loss", "word_ins-loss",
                      "word_del-loss")


def insertion_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                   batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                   train: bool = True, noise: str = "random_delete"
                   ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """nat_loss over the insertion transformer's soft per-gap labels
    (nat_loss.py:60-64 kl_div branch: sum_w t*(log t - log p), mean over
    the gap mask). cfg: insertion_transformer.InsertionConfig."""
    from ..models import insertion_transformer as ins
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_noise, r_model = jax.random.split(rng)
    tgt = batch["target"]
    prev_target = inject_noise(tgt, noise, r_noise)
    net = ins.forward(variables, cfg,
                      {**batch, "prev_target": prev_target},
                      rng=r_model, deterministic=not train, train=train)
    lp = jax.nn.log_softmax(net["word_ins_out"].astype(jnp.float32), -1)
    t = net["word_ins_tgt"]
    log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-30)), 0.0)
    kl = jnp.sum(t * (log_t - lp), axis=-1)        # (B, T-1)
    mask = net["word_ins_mask"]
    denom = jnp.maximum(jnp.sum(mask), 1)
    nll_mean = jnp.sum(jnp.where(mask, kl, 0.0)) / denom
    ls = lcfg.label_smoothing
    if ls > 0:
        mean_lp = jnp.sum(jnp.where(mask[..., None], lp, 0.0)) \
            / (denom * lp.shape[-1])
        loss = nll_mean * (1.0 - ls) - mean_lp * ls
    else:
        loss = nll_mean
    logging = {
        "loss": loss,
        "nll_loss": nll_mean,
        "word_ins-loss": loss,
        "ntokens": jnp.sum(tgt != PAD),
        "nsentences": jnp.int32(tgt.shape[0]),
        "sample_size": jnp.int32(1),
    }
    return loss, {"new_stats": net["new_stats"], "logging": logging,
                  "sample_size": jnp.int32(1)}


insertion_loss.mean_keys = ("loss", "nll_loss", "word_ins-loss")


def fastspeech2_loss(variables: Dict[str, Any], cfg, lcfg: LossConfig,
                     batch: Dict[str, Any], rng: Optional[jax.Array] = None,
                     train: bool = True
                     ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """FastSpeech2 criterion parity (fairseq/criterions/fastspeech2_loss.py):
    L1 on mel (pre + post when a postnet exists), MSE on pitch/energy over
    source positions, MSE on log(duration+1), optional CTC of the source
    tokens against the mel-frame logits. cfg: models.fastspeech2.FS2Config.

    batch keys: src_text (B,Ts) + src_text_len, tgt_speech (B,Tt,F) +
    target_lengths, durations (B,Ts), pitches (B,Ts), energies (B,Ts),
    optional speaker."""
    from ..models import fastspeech2 as fs2
    net = fs2.forward(
        variables, cfg, batch["src_text"], batch["src_text_len"],
        speaker=batch.get("speaker"),
        durations=batch["durations"], pitches=batch["pitches"],
        energies=batch["energies"],
        max_out_len=batch["tgt_speech"].shape[1],
        rng=rng, deterministic=not train, train=train)

    b, tt, _ = batch["tgt_speech"].shape
    ts = batch["src_text"].shape[1]
    tgt_mask = lengths_to_mask(batch["target_lengths"], tt)[:, :, None]
    src_mask = lengths_to_mask(batch["src_text_len"], ts)
    feat = batch["tgt_speech"].astype(jnp.float32)

    l1 = masked_mean(jnp.abs(net["feat_out"].astype(jnp.float32) - feat),
                     tgt_mask)
    if cfg.add_postnet:
        l1 = l1 + masked_mean(
            jnp.abs(net["post_feat_out"].astype(jnp.float32) - feat),
            tgt_mask)
    pitch = masked_mean(
        (net["pitch_out"].astype(jnp.float32)
         - batch["pitches"].astype(jnp.float32)) ** 2, src_mask)
    energy = masked_mean(
        (net["energy_out"].astype(jnp.float32)
         - batch["energies"].astype(jnp.float32)) ** 2, src_mask)
    log_dur = jnp.log(batch["durations"].astype(jnp.float32) + 1.0)
    dur = masked_mean(
        (net["log_dur_out"].astype(jnp.float32) - log_dur) ** 2, src_mask)

    ctc = jnp.float32(0.0)
    if lcfg.ctc_weight > 0.0 and "ctc_logits" in net:
        logits = net["ctc_logits"].astype(jnp.float32)
        logit_pad = (~lengths_to_mask(batch["target_lengths"], tt)
                     ).astype(jnp.float32)
        labels = jnp.where(src_mask, batch["src_text"], 0)
        label_pad = (~src_mask).astype(jnp.float32)
        per_ex = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                blank_id=0)
        per_ex = per_ex / jnp.maximum(
            batch["src_text_len"].astype(jnp.float32), 1.0)
        ctc = jnp.mean(per_ex) * lcfg.ctc_weight

    loss = l1 + dur + pitch + energy + ctc
    ntokens = jnp.sum(batch["target_lengths"])
    sample_size = jnp.int32(b)   # fastspeech2_loss.py: nsentences
    logging = {
        "loss": loss, "l1_loss": l1, "dur_loss": dur, "pitch_loss": pitch,
        "energy_loss": energy, "ctc_loss": ctc,
        "ntokens": ntokens, "nsentences": jnp.int32(b),
        "sample_size": sample_size,
    }
    return loss, {"new_stats": net["new_stats"], "logging": logging,
                  "sample_size": sample_size}


fastspeech2_loss.mean_keys = ("loss", "l1_loss", "dur_loss", "pitch_loss",
                              "energy_loss", "ctc_loss")


# ---------------------------------------------------------------------------
# wav2vec 2.0 pretraining criterion
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Wav2VecLossConfig:
    """Mirrors Wav2VecCriterionConfig (wav2vec_criterion.py:20-34) at the
    wav2vec2-base recipe operating point: --infonce is implied (the CE
    branch; BCE is the wav2vec-1.0 leftover) and --loss-weights [0.1, 10]
    maps to (prob_ppl_weight, features_pen_weight) in get_extra_losses
    order (wav2vec2.py:715-727)."""
    infonce: bool = True
    prob_ppl_weight: float = 0.1
    features_pen_weight: float = 10.0


def wav2vec_loss(variables, cfg, lcfg: Wav2VecLossConfig, batch,
                 rng=None, train: bool = True):
    """Wav2vecCriterion.forward, XLA branch (wav2vec_criterion.py:44-110):
    InfoNCE cross-entropy over (1 positive + N negatives) at every frame,
    weighted by the span mask (no dynamic shrink); extra penalties scaled
    by sample_size. The gumbel temperature anneal reads ``num_updates``
    from model stats and the new count is returned through ``new_stats`` —
    the counter therefore checkpoints/resumes with the model."""
    from ..models import wav2vec2 as w2v
    params, stats = variables["params"], variables["stats"]
    num_updates = stats["num_updates"]
    net = w2v.forward_pretrain(params, cfg, batch["source"],
                               batch["source_lens"], num_updates, rng,
                               train=train)
    logits = net["logits"]                                   # (N+1, B, T)
    # weight = masked & non-padding frames (criterion: mask_indices reshape)
    w = (net["mask"] & ~net["padding_mask"]).astype(jnp.float32)  # (B, T)
    lp = jax.nn.log_softmax(logits, axis=0)
    main_loss = -jnp.sum(lp[0] * w)
    sample_size = jnp.sum(w)
    loss = main_loss
    logging: Dict[str, Any] = {"loss": main_loss}
    if "prob_perplexity" in net and lcfg.prob_ppl_weight != 0.0:
        ppl_pen = (net["num_vars"] - net["prob_perplexity"]) / net["num_vars"]
        ppl_term = lcfg.prob_ppl_weight * ppl_pen * sample_size
        loss = loss + ppl_term
        logging["prob_ppl_loss"] = ppl_term
        logging["prob_perplexity"] = net["prob_perplexity"]
        logging["code_perplexity"] = net["code_perplexity"]
        logging["temp"] = net["temp"]
    if lcfg.features_pen_weight != 0.0:
        pen_term = lcfg.features_pen_weight * net["features_pen"] \
            * sample_size
        loss = loss + pen_term
        logging["features_pen"] = pen_term
    # accuracy meters (criterion :139-153: count of argmax==positive)
    pred = jnp.argmax(logits, axis=0)
    logging["n_correct"] = jnp.sum((pred == 0) * w)
    logging["total"] = sample_size
    logging["ntokens"] = sample_size
    logging["nsentences"] = jnp.int32(batch["source"].shape[0])
    logging["sample_size"] = sample_size
    new_stats = dict(stats)
    if train:
        new_stats["num_updates"] = num_updates + 1
    return loss, {"new_stats": new_stats, "logging": logging,
                  "sample_size": sample_size}


wav2vec_loss.mean_keys = ("prob_perplexity", "code_perplexity", "temp")


# ---------------------------------------------------------------------------
# HuBERT pretraining criterion
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HubertLossConfig:
    """Mirrors HubertCriterionConfig (hubert_criterion.py:19-35).
    ``loss_weights`` in the reference is the coefficient list for
    get_extra_losses — HuBERT exposes exactly one extra loss
    (features_pen, hubert.py:551-559), so it collapses to a scalar."""
    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    features_pen_weight: float = 10.0


def _hubert_stream_ce(logits: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """sum-reduced F.cross_entropy(logits, 0) over frames where w=1.

    ``logits`` is (B, T, 1+V) with column 0 the positive and -inf holes
    for the negative equal to the positive; the reference gathers the
    selected frames first (dynamic shape) — we weight instead."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(lp[:, :, 0] * w)


def hubert_loss(variables, cfg, lcfg: HubertLossConfig, batch,
                rng=None, train: bool = True):
    """HubertCriterion.forward (hubert_criterion.py:47-135): per-stream
    masked/unmasked NCE cross-entropy with the positive at column 0,
    sample_size = frame count of the first active branch (counted once,
    NOT per stream — :67,:81), features_pen scaled by sample_size
    (:84-98), and the reference's correct/count accuracy meters
    (argmax==0 minus the argmax&argmin degenerate tie, :112-123)."""
    from ..models import hubert as hub
    params, stats = variables["params"], variables["stats"]
    net = hub.forward_pretrain(params, cfg, batch["source"],
                               batch["source_lens"],
                               list(batch["target_list"]), rng, train=train)
    pad = net["padding_mask"]
    w_m = (net["mask"] & ~pad).astype(jnp.float32)
    w_u = (~net["mask"] & ~pad).astype(jnp.float32)
    loss = jnp.float32(0.0)
    sample_size = jnp.float32(0.0)
    logging: Dict[str, Any] = {}
    for branch, w, wt in (("m", w_m, lcfg.pred_masked_weight),
                          ("u", w_u, lcfg.pred_nomask_weight)):
        if wt <= 0 or (branch == "m" and cfg.skip_masked) or \
                (branch == "u" and cfg.skip_nomask):
            continue
        n = jnp.sum(w)
        for i, lg in enumerate(net["logits"]):
            li = _hubert_stream_ce(lg, w)
            logging[f"loss_{branch}_{i}"] = li
            loss = loss + wt * li
            # accuracy meters (:112-123)
            amax = jnp.argmax(lg, axis=-1) == 0
            amin = jnp.argmin(lg, axis=-1) == 0
            logging[f"correct_{branch}_{i}"] = jnp.sum(
                (amax & ~(amax & amin)) * w)
            logging[f"count_{branch}_{i}"] = n
        sample_size = sample_size + n
    if lcfg.features_pen_weight != 0.0:
        pen = lcfg.features_pen_weight * net["features_pen"] * sample_size
        loss = loss + pen
        logging["loss_features_pen"] = pen
    logging["loss"] = loss
    logging["ntokens"] = sample_size
    logging["nsentences"] = jnp.int32(batch["source"].shape[0])
    logging["sample_size"] = sample_size
    return loss, {"new_stats": dict(stats), "logging": logging,
                  "sample_size": sample_size}


# ---------------------------------------------------------------------------
# CTC ASR fine-tuning criterion
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CtcLossConfig:
    """CtcCriterionConfig (ctc.py:24-64). post_process="letter" is the
    only mode wired (the recipes' mode): word boundaries at the "|"
    unit."""
    zero_infinity: bool = True
    sentence_avg: bool = False
    pad_idx: int = 1
    eos_idx: int = 2
    blank_idx: int = 0
    sep_idx: int = -1          # dictionary index of "|" (-1: no word sep)


def _levenshtein_unit(x: jnp.ndarray, xlen: jnp.ndarray, y: jnp.ndarray,
                      ylen: jnp.ndarray) -> jnp.ndarray:
    """Batched unit-cost edit distance (editdistance.eval semantics used
    by ctc.py:200-218). x: (B, Lx) int32, y: (B, Ly); padded tails are
    never visited because we read the table at (xlen, ylen)."""
    b, lx = x.shape
    ly = y.shape[1]
    j_idx = jnp.arange(ly + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(j_idx, (b, ly + 1))

    def step(prev_row, x_i):
        neq = (x_i["tok"][:, None] != y).astype(jnp.int32)
        c_tail = jnp.minimum(prev_row[:, 1:] + 1, prev_row[:, :-1] + neq)
        c = jnp.concatenate(
            [jnp.full((b, 1), x_i["i"], jnp.int32), c_tail], axis=1)
        row = j_idx[None, :] + jax.lax.cummin(c - j_idx[None, :], axis=1)
        return row, row

    xs = {"tok": x.T, "i": jnp.arange(1, lx + 1, dtype=jnp.int32)}
    _, rows = jax.lax.scan(step, row0, xs)
    table = jnp.concatenate([row0[None], rows], axis=0)   # (Lx+1, B, Ly+1)
    r = jnp.take_along_axis(table, xlen[None, :, None], axis=0)[0]
    return jnp.take_along_axis(r, ylen[:, None], axis=1)[:, 0]


def _pack_words(toks: jnp.ndarray, n: jnp.ndarray, sep: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment a (B, L) unit sequence at ``sep`` into per-word 32-bit
    rolling hashes, left-packed. Hash equality stands in for word string
    equality (collision odds ~2^-32 per word pair — metrics-grade).
    Empty segments are dropped, matching post_process("letter").split()."""
    b, l = toks.shape
    t_idx = jnp.arange(l)[None, :]
    valid = t_idx < n[:, None]
    is_sep = (toks == sep) | ~valid

    def scan_hash(h, col):
        tok, sep_c = col
        h = jnp.where(sep_c, jnp.uint32(0),
                      h * jnp.uint32(1000003) + tok.astype(jnp.uint32) + 1)
        return h, h
    _, hs = jax.lax.scan(scan_hash, jnp.zeros((b,), jnp.uint32),
                         (toks.T, is_sep.T))
    hs = hs.T                                                # (B, L)
    nxt_sep = jnp.concatenate(
        [is_sep[:, 1:], jnp.ones((b, 1), bool)], axis=1)
    word_end = ~is_sep & nxt_sep                             # nonempty ends
    pos = jnp.cumsum(word_end.astype(jnp.int32), axis=1) - 1
    nw = jnp.sum(word_end, axis=1).astype(jnp.int32)
    out = jnp.zeros((b, l), jnp.uint32)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, l))
    out = out.at[rows, jnp.where(word_end, pos, l - 1)].set(
        jnp.where(word_end, hs, jnp.uint32(0)), mode="drop")
    out = jnp.where(t_idx < nw[:, None], out, jnp.uint32(0))
    return out.astype(jnp.int32), nw


def ctc_loss(variables, cfg, lcfg: CtcLossConfig, batch,
             rng=None, train: bool = True):
    """CtcCriterion.forward (ctc.py:109-226): sum-reduced CTC over
    non-pad/eos targets, zero_infinity, sample_size = ntokens (or
    nsentences under --sentence-avg); during eval, greedy-decode UER/WER
    counters (c_errors/c_total/w_errors/w_total) computed IN-GRAPH with a
    batched unit-cost edit distance instead of the reference's host
    editdistance loop."""
    from ..models import ctc_asr
    params, stats = variables["params"], variables["stats"]
    num_updates = stats["num_updates"]
    net = ctc_asr.forward_ctc(params, cfg, batch["source"],
                              batch["source_lens"], rng, train=train,
                              num_updates=num_updates)
    logits = net["logits"].astype(jnp.float32)               # (B, T, V)
    if cfg.blank_weight != 0:                                # train path too
        if cfg.blank_mode == "add":
            logits = logits.at[..., lcfg.blank_idx].add(cfg.blank_weight)
        else:
            logits = logits.at[..., lcfg.blank_idx].set(cfg.blank_weight)
    pad_frames = net["padding_mask"]
    in_lens = jnp.sum(~pad_frames, axis=1).astype(jnp.int32)
    target = batch["target"]                                  # (B, U)
    tgt_keep = (target != lcfg.pad_idx) & (target != lcfg.eos_idx)
    tgt_lens = jnp.sum(tgt_keep, axis=1).astype(jnp.int32)
    per_ex = optax.ctc_loss(
        logits, pad_frames.astype(jnp.float32),
        jnp.where(tgt_keep, target, 0),
        (~tgt_keep).astype(jnp.float32), blank_id=lcfg.blank_idx)
    if lcfg.zero_infinity:
        per_ex = jnp.where(jnp.isfinite(per_ex), per_ex, 0.0)
    # padded batch rows (source_lens == 0) contribute empty targets -> 0
    real = (batch["source_lens"] > 0).astype(jnp.float32)
    loss = jnp.sum(per_ex * real)
    ntokens = jnp.sum(tgt_lens * real)
    nsentences = jnp.sum(real)
    sample_size = nsentences if lcfg.sentence_avg else ntokens
    logging: Dict[str, Any] = {
        "loss": loss, "ntokens": ntokens, "nsentences": nsentences,
        "sample_size": sample_size}
    if not train:
        toks, n = ctc_asr.greedy_ctc_decode(logits, in_lens,
                                            blank=lcfg.blank_idx)
        # target units left-packed (they are already: pad/eos are suffix)
        tgt = jnp.where(tgt_keep, target, 0).astype(jnp.int32)
        c_err = _levenshtein_unit(toks, n, tgt, tgt_lens)
        logging["c_errors"] = jnp.sum(c_err * real)
        logging["c_total"] = ntokens
        if lcfg.sep_idx >= 0:
            hw, nw = _pack_words(toks, n, lcfg.sep_idx)
            tw, ntw = _pack_words(tgt, tgt_lens, lcfg.sep_idx)
            w_err = _levenshtein_unit(hw, nw, tw, ntw)
            logging["w_errors"] = jnp.sum(w_err * real)
            logging["wv_errors"] = logging["w_errors"]
            logging["w_total"] = jnp.sum(ntw * real)
    return loss, {"new_stats": dict(stats), "logging": logging,
                  "sample_size": sample_size}
