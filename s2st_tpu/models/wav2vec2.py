"""wav2vec 2.0 self-supervised pretraining, TPU-native.

Parity: ``fairseq/models/wav2vec/wav2vec2.py`` (Wav2Vec2Model) +
``fairseq/modules/gumbel_vector_quantizer.py``. The reference's own XLA
branch is the spec followed here: on XLA fairseq keeps FULL-length tensors
(no dynamic shrink to masked positions, wav2vec2.py:589-597 and :666-669
"tpu-comment"), samples negatives over the full time axis, and weights the
InfoNCE loss by ``mask_indices`` (wav2vec_criterion.py:75-90). This module
is that branch designed natively: every tensor is static-shape, the whole
step jits, and the gumbel temperature anneal runs in-graph off a
``num_updates`` scalar carried in model stats (no host-side
``set_num_updates`` mutation, wav2vec2 GumbelVectorQuantizer:86-89).

Architecture trunk (conv feature extractor + pos-conv transformer encoder)
is shared with :mod:`.hubert` — the two models are identical below the
pretraining heads (fairseq/models/hubert/hubert.py reuses the same
ConvFeatureExtractionModel/TransformerEncoder classes).

Known deviation (documented, statistically tested): mask span starts are
drawn WITH replacement (fairseq's np.random.choice(..., replace=False),
data_utils.py:compute_mask_indices); overlapping spans merge, so the
realized mask fraction is marginally lower at equal ``mask_prob``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import (Params, dropout, layer_norm, lengths_to_padding_mask,
                       linear)
from ..nn.attention import mha
from .hubert import (HubertConfig, _extractor, _gelu, _pos_conv, init_hubert)


@dataclass(frozen=True)
class Wav2Vec2Config:
    """wav2vec2 base defaults (Wav2Vec2Config, wav2vec2.py:36-230)."""
    trunk: HubertConfig = field(default_factory=HubertConfig)
    final_dim: int = 256
    logit_temp: float = 0.1
    quantize_targets: bool = True
    latent_vars: int = 320            # V entries per group
    latent_groups: int = 2            # G groups
    latent_dim: int = 0               # 0 -> final_dim split across groups
    latent_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    mask_prob: float = 0.65
    mask_length: int = 10
    mask_min_masks: int = 2           # compute_mask_indices min_masks=2
    num_negatives: int = 100
    cross_sample_negatives: int = 0
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    feature_grad_mult: float = 0.1    # wav2vec2 base recipe value
    dtype: Any = jnp.float32

    @property
    def vq_dim(self) -> int:
        return self.latent_dim if self.latent_dim > 0 else self.final_dim

    @property
    def var_dim(self) -> int:
        assert self.vq_dim % self.latent_groups == 0
        return self.vq_dim // self.latent_groups


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_wav2vec2(key, cfg: Wav2Vec2Config) -> Dict[str, Any]:
    """Returns {"params", "stats"}; stats carries the update counter that
    drives the gumbel temperature anneal in-graph."""
    k_trunk, k_mask, k_qproj, k_vars, k_pq, k_fp = jax.random.split(key, 6)
    d_model = cfg.trunk.encoder_embed_dim
    embed = cfg.trunk.conv_layers[-1][0]
    G, V = cfg.latent_groups, cfg.latent_vars

    def nrm(k, shape, scale):
        return jax.random.normal(k, shape) * scale

    p: Params = {"trunk": init_hubert(k_trunk, cfg.trunk)}
    # mask_emb: FloatTensor(d).uniform_() == U[0,1) (wav2vec2.py:324-326)
    p["mask_emb"] = jax.random.uniform(k_mask, (d_model,))
    if cfg.quantize_targets:
        p["quantizer"] = {
            # weight_proj: init.normal_(std=1), zero bias (gumbel_vq.py:72-74)
            "proj": {"w": jax.random.normal(k_qproj, (embed, G * V)),
                     "b": jnp.zeros((G * V,))},
            # vars: (G*V, var_dim), U[0,1) (gumbel_vq.py:55-56)
            "vars": jax.random.uniform(k_vars, (G * V, cfg.var_dim)),
        }
        p["project_q"] = {"w": nrm(k_pq, (cfg.vq_dim, cfg.final_dim),
                                   cfg.vq_dim ** -0.5),
                          "b": jnp.zeros((cfg.final_dim,))}
    else:
        p["project_q"] = {"w": nrm(k_pq, (embed, cfg.final_dim),
                                   embed ** -0.5),
                          "b": jnp.zeros((cfg.final_dim,))}
    p["final_proj"] = {"w": nrm(k_fp, (d_model, cfg.final_dim),
                                d_model ** -0.5),
                       "b": jnp.zeros((cfg.final_dim,))}
    return {"params": p,
            "stats": {"num_updates": jnp.zeros((), jnp.int32)}}


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------

def _grad_mult(x: jnp.ndarray, c: float) -> jnp.ndarray:
    """GradMultiply.apply (fairseq/modules/grad_multiply.py): identity
    forward, grad scaled by c — expressed as a convex combination with a
    stop_gradient branch (exact same fwd value, cotangent scaled by c)."""
    if c == 1.0:
        return x
    if c == 0.0:
        return jax.lax.stop_gradient(x)
    return x * c + jax.lax.stop_gradient(x) * (1.0 - c)


def compute_span_mask(rng, lengths: jnp.ndarray, max_len: int,
                      mask_prob: float, mask_length: int,
                      min_masks: int = 2) -> jnp.ndarray:
    """Static-shape span mask (compute_mask_indices "static" selection,
    fairseq/data/data_utils.py:385-465).

    Per sample i with valid length sz_i:
    ``num_mask_i = int(mask_prob * sz_i / mask_length + rand())`` (the
    reference's probabilistic rounding), clipped to at least ``min_masks``;
    span starts uniform over [0, sz_i - mask_length] (with replacement —
    see module docstring). Returns bool (B, max_len), False on padding.
    """
    b = lengths.shape[0]
    # static upper bound on spans per sample (+1 covers the rand() round-up)
    m_max = max(int(mask_prob * max_len / float(mask_length)) + 1, min_masks)
    r_num, r_start = jax.random.split(rng)
    sz = lengths.astype(jnp.float32)
    n_f = mask_prob * sz / float(mask_length) + \
        jax.random.uniform(r_num, (b,))
    n = jnp.clip(jnp.floor(n_f).astype(jnp.int32), min_masks, m_max)
    # don't mask more than fits: fairseq caps num_mask at sz - min_len
    n = jnp.minimum(n, jnp.maximum(
        lengths - mask_length, 1).astype(jnp.int32))
    lo = jnp.maximum(lengths - mask_length, 1).astype(jnp.float32)
    starts = jnp.floor(jax.random.uniform(r_start, (b, m_max))
                       * lo[:, None]).astype(jnp.int32)      # (B, M)
    active = jnp.arange(m_max)[None, :] < n[:, None]          # (B, M)
    t = jnp.arange(max_len)[None, None, :]                    # (1, 1, T)
    span = (t >= starts[:, :, None]) & (t < starts[:, :, None] + mask_length)
    mask = jnp.any(span & active[:, :, None], axis=1)         # (B, T)
    return mask & (jnp.arange(max_len)[None, :] < lengths[:, None])


def gumbel_quantize(p: Params, cfg: Wav2Vec2Config, x: jnp.ndarray,
                    temp: jnp.ndarray, rng, train: bool) -> Dict[str, Any]:
    """GumbelVectorQuantizer.forward (gumbel_vector_quantizer.py:140-202):
    per-group gumbel-softmax code selection with a straight-through
    estimator; returns quantized vectors + codebook usage diagnostics."""
    b, t, _ = x.shape
    G, V = cfg.latent_groups, cfg.latent_vars
    logits = linear(p["proj"], x).reshape(b * t, G, V).astype(jnp.float32)
    k = jnp.argmax(logits, axis=-1)                           # (BT, G)
    hard = jax.nn.one_hot(k, V, dtype=jnp.float32)            # (BT, G, V)
    hard_probs = hard.mean(axis=0)                            # (G, V)
    code_ppl = jnp.exp(-jnp.sum(
        hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)).sum()
    avg_probs = jax.nn.softmax(logits, axis=-1).mean(axis=0)  # (G, V)
    prob_ppl = jnp.exp(-jnp.sum(
        avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)).sum()
    if train:
        g = jax.random.gumbel(rng, logits.shape, jnp.float32)
        y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), V,
                                dtype=jnp.float32)
        q = y_hard + y_soft - jax.lax.stop_gradient(y_soft)   # ST estimator
    else:
        q = hard
    vars_ = p["vars"].reshape(G, V, cfg.var_dim)
    out = jnp.einsum("ngv,gvd->ngd", q, vars_.astype(jnp.float32))
    out = out.reshape(b, t, G * cfg.var_dim)
    return {"x": out, "code_perplexity": code_ppl,
            "prob_perplexity": prob_ppl, "num_vars": float(G * V),
            "targets": k.reshape(b, t, G)}


def sample_negatives(rng, y: jnp.ndarray, n_negatives: int,
                     cross_sample_negatives: int = 0) -> jnp.ndarray:
    """Wav2Vec2Model.sample_negatives (wav2vec2.py:419-475), full-length
    (XLA) regime: for each anchor (b, t) draw indices over the sample's own
    time axis, skipping t itself via the reference's "draw from high-1 then
    bump >= t" trick. Returns (N, B, T, C)."""
    b, t, c = y.shape
    parts = []
    if n_negatives > 0:
        r1, rng = jax.random.split(rng)
        tszs = jnp.repeat(jnp.arange(t), n_negatives)[None, :]  # (1, T*N)
        idx = jax.random.randint(r1, (b, t * n_negatives), 0, t - 1)
        idx = jnp.where(idx >= tszs, idx + 1, idx)
        parts.append(idx.reshape(b, t, n_negatives))
    if cross_sample_negatives > 0:
        r2, rng = jax.random.split(rng)
        flat = y.reshape(b * t, c)
        tszs = jnp.repeat(jnp.arange(t), cross_sample_negatives)[None, :]
        cidx = jax.random.randint(
            r2, (b, t * cross_sample_negatives), 0, b * t - 1)
        cidx = jnp.where(cidx >= tszs, cidx + 1, cidx)
        cross = flat[cidx.reshape(-1)].reshape(
            b, t, cross_sample_negatives, c)
    negs = []
    if parts:
        # gather: for each (b, t, n) pick y[b, idx[b,t,n], :]
        own = y[jnp.arange(b)[:, None, None], parts[0], :]     # (B,T,N,C)
        negs.append(own)
    if cross_sample_negatives > 0:
        negs.append(cross)
    out = jnp.concatenate(negs, axis=2)                        # (B,T,N,C)
    return out.transpose(2, 0, 1, 3)                           # (N,B,T,C)


def compute_preds(cfg: Wav2Vec2Config, x: jnp.ndarray, y: jnp.ndarray,
                  negatives: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity InfoNCE logits (wav2vec2.py:477-496). Row 0 is the
    positive; duplicate negatives get the XLA-branch fill value -2^30."""
    neg_is_pos = jnp.all(y[None] == negatives, axis=-1)        # (N,B,T)
    targets = jnp.concatenate([y[None], negatives], axis=0)    # (N+1,B,T,C)
    xf = x[None].astype(jnp.float32)
    tf = targets.astype(jnp.float32)
    num = jnp.sum(xf * tf, axis=-1)
    den = jnp.linalg.norm(xf, axis=-1) * jnp.linalg.norm(tf, axis=-1)
    logits = num / jnp.maximum(den, 1e-8) / cfg.logit_temp     # (N+1,B,T)
    fill = jnp.float32(-(2.0 ** 30))
    pad_row = jnp.zeros_like(neg_is_pos[:1])
    is_dup = jnp.concatenate([pad_row, neg_is_pos], axis=0)
    return jnp.where(is_dup, fill, logits)


def _encoder_layer_train(p: Params, cfg: Wav2Vec2Config, x, padding_mask,
                         rng, train: bool):
    """Post-LN transformer layer with the pretraining dropouts
    (fairseq TransformerSentenceEncoderLayer regime)."""
    r_attn, r_d1, r_d2, r_d3 = jax.random.split(rng, 4)
    residual = x
    h, _ = mha(p["self_attn"], x, x, x, cfg.trunk.encoder_attention_heads,
               key_padding_mask=padding_mask,
               dropout_rate=cfg.attention_dropout, rng=r_attn,
               deterministic=not train)
    h = dropout(h, cfg.dropout, r_d1, not train)
    x = layer_norm(p["self_attn_ln"], residual + h)
    residual = x
    h = _gelu(linear(p["fc1"], x))
    h = dropout(h, cfg.activation_dropout, r_d2, not train)
    h = linear(p["fc2"], h)
    h = dropout(h, cfg.dropout, r_d3, not train)
    x = layer_norm(p["final_ln"], residual + h)
    return x


def current_temp(cfg: Wav2Vec2Config, num_updates) -> jnp.ndarray:
    """max(max_temp * decay^n, min_temp) (gumbel_vq.py set_num_updates)."""
    mx, mn, decay = cfg.latent_temp
    n = num_updates.astype(jnp.float32)
    return jnp.maximum(mx * jnp.exp(n * jnp.log(decay)), mn)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def forward_pretrain(params: Params, cfg: Wav2Vec2Config,
                     source: jnp.ndarray, lengths: jnp.ndarray,
                     num_updates, rng, train: bool = True
                     ) -> Dict[str, Any]:
    """Wav2Vec2Model.forward (wav2vec2.py:515-690), full-length XLA branch.

    source: (B, L) fp32 waveform; lengths: (B,) valid samples.
    Returns logits (N+1, B, T'), mask/padding (B, T'), penalties and
    quantizer diagnostics. All shapes static.
    """
    tr = params["trunk"]
    tcfg = cfg.trunk
    (r_mask, r_di, r_df, r_q, r_neg, r_enc) = jax.random.split(rng, 6)

    feats = _extractor(tr["extractor"], tcfg, source.astype(cfg.dtype))
    feats = _grad_mult(feats, cfg.feature_grad_mult)
    # features_pen BEFORE layer_norm, fp32, over all positions incl. padding
    # (wav2vec2.py:534: features.float().pow(2).mean() on the padded batch)
    features_pen = jnp.mean(jnp.square(feats.astype(jnp.float32)))
    feats = layer_norm(tr["feat_ln"], feats)
    unmasked = feats                                           # (B,T,512)

    t_out = feats.shape[1]
    out_lengths = jnp.clip(tcfg.output_length(lengths), 0, t_out)
    padding_mask = lengths_to_padding_mask(out_lengths, t_out)

    x = linear(tr["post_proj"], feats)
    x = dropout(x, cfg.dropout_input, r_di, not train)
    unmasked = dropout(unmasked, cfg.dropout_features, r_df, not train)

    mask = compute_span_mask(r_mask, out_lengths, t_out, cfg.mask_prob,
                             cfg.mask_length, cfg.mask_min_masks) \
        if cfg.mask_prob > 0 else jnp.zeros((x.shape[0], t_out), bool)
    x = jnp.where(mask[:, :, None], params["mask_emb"].astype(x.dtype), x)

    # encoder (pos conv + post-LN stack), with pretraining dropouts
    x = jnp.where(padding_mask[:, :, None], 0.0, x)
    x = x + _pos_conv(tr["pos_conv"], tcfg, x)
    if not tcfg.layer_norm_first:
        x = layer_norm(tr["enc_ln"], x)
    for i in range(tcfg.encoder_layers):
        x = _encoder_layer_train(tr[f"layer{i}"], cfg, x, padding_mask,
                                 jax.random.fold_in(r_enc, i), train)
    if tcfg.layer_norm_first:
        x = layer_norm(tr["enc_ln"], x)

    temp = current_temp(cfg, num_updates)
    if cfg.quantize_targets:
        q = gumbel_quantize(params["quantizer"], cfg, unmasked, temp, r_q,
                            train)
        y = linear(params["project_q"],
                   q["x"].astype(jnp.float32))                 # (B,T,final)
        prob_ppl, code_ppl = q["prob_perplexity"], q["code_perplexity"]
        num_vars = q["num_vars"]
    else:
        y = linear(params["project_q"], unmasked.astype(jnp.float32))
        prob_ppl = code_ppl = None
        num_vars = 0.0

    negs = sample_negatives(r_neg, y, cfg.num_negatives,
                            cfg.cross_sample_negatives)
    x = linear(params["final_proj"], x).astype(jnp.float32)
    logits = compute_preds(cfg, x, y, negs)                    # (N+1,B,T)
    out = {"logits": logits, "mask": mask, "padding_mask": padding_mask,
           "features_pen": features_pen, "temp": temp,
           "num_vars": num_vars}
    if prob_ppl is not None:
        out["prob_perplexity"] = prob_ppl
        out["code_perplexity"] = code_ppl
    return out


def extract_features(params: Params, cfg: Wav2Vec2Config, source, lengths,
                     output_layer: Optional[int] = None):
    """Inference path == hubert.extract_features on the shared trunk
    (Wav2Vec2Model.extract_features, mask=False features_only=True)."""
    from . import hubert as H
    return H.extract_features(params["trunk"], cfg.trunk, source, lengths,
                              output_layer=output_layer)


def param_count(variables) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


# ---------------------------------------------------------------------------
# torch (fairseq) checkpoint import
# ---------------------------------------------------------------------------

def config_from_torch_ckpt(path: str) -> Wav2Vec2Config:
    """Read a fairseq wav2vec2 checkpoint's cfg.model into Wav2Vec2Config
    (trunk fields shared with HuBERT come via hubert.config_from_torch_ckpt
    — identical key names)."""
    import ast
    import torch
    from .hubert import config_from_torch_ckpt as hubert_cfg
    trunk = hubert_cfg(path)
    state = torch.load(path, map_location="cpu", weights_only=False)
    mc = state.get("cfg", None)
    mc = (dict(mc["model"]) if mc is not None and not hasattr(mc, "model")
          else dict(getattr(mc, "model", {})) if mc is not None else {})
    temp = mc.get("latent_temp", (2.0, 0.5, 0.999995))
    if isinstance(temp, str):
        temp = ast.literal_eval(temp)
    return Wav2Vec2Config(
        trunk=trunk,
        final_dim=int(mc.get("final_dim", 256)),
        logit_temp=float(mc.get("logit_temp", 0.1)),
        quantize_targets=bool(mc.get("quantize_targets", False)),
        latent_vars=int(mc.get("latent_vars", 320)),
        latent_groups=int(mc.get("latent_groups", 2)),
        latent_dim=int(mc.get("latent_dim", 0)),
        latent_temp=tuple(temp),
        mask_prob=float(mc.get("mask_prob", 0.65)),
        mask_length=int(mc.get("mask_length", 10)),
        num_negatives=int(mc.get("num_negatives", 100)),
        cross_sample_negatives=int(mc.get("cross_sample_negatives", 0)),
        dropout=float(mc.get("dropout", 0.1)),
        attention_dropout=float(mc.get("attention_dropout", 0.1)),
        activation_dropout=float(mc.get("activation_dropout", 0.0)),
        dropout_input=float(mc.get("dropout_input", 0.1)),
        dropout_features=float(mc.get("dropout_features", 0.1)),
        feature_grad_mult=float(mc.get("feature_grad_mult", 1.0)),
    )


def load_torch_wav2vec2(path: str, cfg: Optional[Wav2Vec2Config] = None):
    """Import a fairseq wav2vec2 checkpoint ({"model": state_dict, "cfg"}):
    trunk via the HuBERT importer (identical key layout — both models share
    ConvFeatureExtractionModel/TransformerEncoder in the reference), plus
    the pretraining heads (mask_emb, quantizer, project_q, final_proj).
    Returns ({"params", "stats"}, cfg)."""
    import numpy as np
    import torch
    from .hubert import load_torch_hubert
    if cfg is None:
        cfg = config_from_torch_ckpt(path)
    trunk_params, _ = load_torch_hubert(path, cfg.trunk)
    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    sd = {k: (v.detach().float().numpy() if torch.is_tensor(v)
              else np.asarray(v, np.float32)) for k, v in sd.items()}

    def lin(prefix):
        p = {"w": sd[prefix + ".weight"].T.copy()}
        if prefix + ".bias" in sd:
            p["b"] = sd[prefix + ".bias"]
        return p

    p: Params = {"trunk": trunk_params, "mask_emb": jnp.asarray(
        sd["mask_emb"])}
    if "quantizer.vars" in sd:
        p["quantizer"] = {
            "proj": jax.tree_util.tree_map(
                jnp.asarray, lin("quantizer.weight_proj")),
            "vars": jnp.asarray(sd["quantizer.vars"][0]),   # (G*V, var_dim)
        }
    p["project_q"] = jax.tree_util.tree_map(jnp.asarray, lin("project_q"))
    p["final_proj"] = jax.tree_util.tree_map(jnp.asarray, lin("final_proj"))
    return {"params": p,
            "stats": {"num_updates": jnp.zeros((), jnp.int32)}}, cfg
