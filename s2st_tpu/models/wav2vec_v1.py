"""wav2vec v1 (Schneider et al. 2019): CPC pretraining on raw audio.

Parity: ``fairseq/models/wav2vec/wav2vec.py`` —
``ConvFeatureExtractionModel`` (:367-417): stride conv blocks (no bias) +
per-sample fp32 GroupNorm(1 group over C,T) + activation, optional
decimated skip connections scaled by sqrt(residual_scale), optional
log(1+|x|) compression; ``ConvAggegator`` (:431-486): causally padded
(zero or edge-replicate) conv blocks with projected skips;
``Wav2VecPredictionsModel`` (:489-629): the ConvTranspose2d(1, steps)
"project to steps" = one linear map per future step, negatives drawn
uniformly over each sample's time axis (same-sample) and/or the whole
batch (cross-sample) with the >=-self shift, and the step-ragged
flattened CPC logits — InfoNCE layout (rows x copies) or the binary-CE
layout with balanced-class weights.

TPU design: the ragged per-step prediction buffer has a STATIC length
(it depends only on shapes), so it is built by concatenating per-step
einsum slabs at trace time — no dynamic shapes under jit. Negative
index sampling takes an explicit rng (or precomputed indices, which the
parity tests use to replay the reference's exact draws).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Params, dropout, split_rngs

PAD = 1


@dataclass(frozen=True)
class Wav2VecV1Config:
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2))
    conv_aggregator_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 3, 1),) * 9
    activation: str = "relu"
    dropout: float = 0.0
    dropout_features: float = 0.0
    dropout_agg: float = 0.0
    log_compression: bool = False
    skip_connections_feat: bool = False
    skip_connections_agg: bool = False
    residual_scale: float = 0.5
    non_affine_group_norm: bool = False
    no_conv_bias: bool = False
    agg_zero_pad: bool = False
    prediction_steps: int = 12
    num_negatives: int = 10
    cross_sample_negatives: int = 0
    sample_distance: Optional[int] = None
    offset: str = "auto"
    balanced_classes: bool = False
    infonce: bool = False
    # vector quantization (vq_type "none" | "kmeans"; the gumbel variant
    # lives in wav2vec2's quantizer)
    vq_type: str = "none"
    vq_vars: int = 320
    vq_groups: int = 2
    vq_dim: int = 0              # 0 -> embed
    vq_gamma: float = 0.25
    combine_groups: bool = False
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "Wav2VecV1Config":
        return dataclasses.replace(self, **kw)

    @property
    def embed(self) -> int:
        return self.conv_feature_layers[-1][0]

    @property
    def agg_dim(self) -> int:
        return self.conv_aggregator_layers[-1][0]

    @property
    def offset_val(self) -> int:
        if self.offset != "auto":
            return int(self.offset)
        jin = rin = 0
        for _, k, stride in self.conv_feature_layers:
            if rin == 0:
                rin = k
            rin = rin + (k - 1) * jin
            jin = stride if jin == 0 else jin * stride
        return int(math.ceil(rin / jin))


def _act(cfg):
    from ..nn.core import get_activation
    return get_activation(cfg.activation)


def _conv_init(key, cin, cout, k, bias):
    kw, kb = jax.random.split(key)
    fan_in = cin * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (k, cin, cout), minval=-bound,
                                 maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), minval=-bound,
                                    maxval=bound)
    return p


def init_wav2vec_v1(key, cfg: Wav2VecV1Config) -> Dict[str, Params]:
    ks = iter(jax.random.split(key, 128))
    feat: Params = {}
    in_d = 1
    for i, (dim, k, _s) in enumerate(cfg.conv_feature_layers):
        feat[f"conv{i}"] = _conv_init(next(ks), in_d, dim, k, bias=False)
        if not cfg.non_affine_group_norm:
            feat[f"gn{i}"] = {"scale": jnp.ones((dim,)),
                              "bias": jnp.zeros((dim,))}
        in_d = dim
    agg: Params = {}
    in_d = cfg.embed
    for i, (dim, k, _s) in enumerate(cfg.conv_aggregator_layers):
        agg[f"conv{i}"] = _conv_init(next(ks), in_d, dim, k,
                                     bias=not cfg.no_conv_bias)
        if not cfg.non_affine_group_norm:
            agg[f"gn{i}"] = {"scale": jnp.ones((dim,)),
                             "bias": jnp.zeros((dim,))}
        if cfg.skip_connections_agg and in_d != dim:
            agg[f"rproj{i}"] = _conv_init(next(ks), in_d, dim, 1,
                                          bias=False)
        in_d = dim
    # ConvTranspose2d(in, out, (1, steps)): weight (in, out, 1, steps)
    fan_in = cfg.agg_dim  # torch convtranspose fan_in = in_ch * 1 * steps/... use torch default
    bound = 1.0 / math.sqrt(cfg.agg_dim * cfg.prediction_steps)
    pred: Params = {
        "w": jax.random.uniform(next(ks),
                                (cfg.agg_dim, cfg.embed,
                                 cfg.prediction_steps),
                                minval=-bound, maxval=bound),
        "b": jax.random.uniform(next(ks), (cfg.embed,),
                                minval=-bound, maxval=bound),
    }
    params = {"feature_extractor": feat, "aggregator": agg,
              "predictions": pred}
    if cfg.vq_type == "kmeans":
        vq_dim = cfg.vq_dim or cfg.embed
        num_groups = 1 if cfg.combine_groups else cfg.vq_groups
        var_dim = vq_dim // cfg.vq_groups
        g = cfg.vq_groups
        cg = cfg.embed // g
        kq, kp = jax.random.split(next(ks))
        params["vq"] = {
            "embedding": 0.01 * jax.random.normal(
                kq, (cfg.vq_vars, num_groups, var_dim)),
            # grouped 1x1 conv (per-group linear), no bias
            "proj": {"w": jax.random.uniform(
                kp, (g, cg, cg), minval=-1.0 / math.sqrt(cg),
                maxval=1.0 / math.sqrt(cg))},
            "gn": {"scale": jnp.ones((cfg.embed,)),
                   "bias": jnp.zeros((cfg.embed,))},
        }
    return {"params": params, "stats": {}}


def kmeans_vq(p: Params, cfg: Wav2VecV1Config, x: jnp.ndarray):
    """KmeansVectorQuantizer (fairseq/modules/kmeans_vector_quantizer.py):
    grouped 1x1 projection + per-group GroupNorm, nearest-codeword
    quantization with a straight-through gradient, latent + gamma *
    commitment MSE. x: (B, T, C) -> (quantized (B, T, C'), kmeans_loss,
    code_perplexity)."""
    b, t, c = x.shape
    g = cfg.vq_groups
    cg = c // g
    xg = x.reshape(b, t, g, cg)
    ze = jnp.einsum("btgi,gio->btgo", xg, p["proj"]["w"].astype(x.dtype))
    # Fp32GroupNorm(groups, dim) over (C/G, T) per (B, group)
    zef = ze.astype(jnp.float32)
    mean = jnp.mean(zef, axis=(1, 3), keepdims=True)
    var = jnp.var(zef, axis=(1, 3), keepdims=True)
    zn = (zef - mean) * jax.lax.rsqrt(var + 1e-5)
    zn = zn.reshape(b, t, c) * p["gn"]["scale"] + p["gn"]["bias"]
    vq_dim = cfg.vq_dim or cfg.embed
    var_dim = vq_dim // g
    zn_g = zn.reshape(b, t, g, var_dim)
    emb = p["embedding"]
    if cfg.combine_groups:
        emb = jnp.broadcast_to(emb, (cfg.vq_vars, g, var_dim))
    # distances (V, B, T, G)
    d = jnp.linalg.norm(zn_g[None] - emb[:, None, None], axis=-1)
    idx = jnp.argmin(d, axis=0)                          # (B, T, G)
    one_hot = jax.nn.one_hot(idx, cfg.vq_vars)           # (B,T,G,V)
    zq = jnp.einsum("btgv,vgd->btgd", one_hot,
                    emb.astype(jnp.float32))
    zq = zq.reshape(b, t, vq_dim).astype(x.dtype)
    zn_flat = zn.astype(x.dtype)
    out = zn_flat + jax.lax.stop_gradient(zq - zn_flat)  # straight-through
    hard_probs = jnp.mean(one_hot.reshape(-1, g, cfg.vq_vars), axis=0)
    code_ppl = jnp.sum(jnp.exp(-jnp.sum(
        hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)))
    zqf = zq.astype(jnp.float32)
    znf = zn.astype(jnp.float32)
    latent = jnp.mean((zqf - jax.lax.stop_gradient(znf)) ** 2)
    commit = jnp.mean((znf - jax.lax.stop_gradient(zqf)) ** 2)
    return out, latent + cfg.vq_gamma * commit, code_ppl


def _group_norm1(p: Optional[Params], x: jnp.ndarray) -> jnp.ndarray:
    """Fp32GroupNorm(1, C) on (B, T, C): normalize over (T, C) per
    sample."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def feature_extractor(variables: Dict[str, Params], cfg: Wav2VecV1Config,
                      source: jnp.ndarray, rng=None,
                      deterministic: bool = True) -> jnp.ndarray:
    """(B, L) raw audio -> (B, T, C) features."""
    p = variables["params"]["feature_extractor"]
    act = _act(cfg)
    x = source.astype(cfg.dtype)[:, :, None]          # (B, L, 1)
    scale = math.sqrt(cfg.residual_scale)
    for i, (dim, k, s) in enumerate(cfg.conv_feature_layers):
        residual = x
        x = jax.lax.conv_general_dilated(
            x, p[f"conv{i}"]["w"].astype(x.dtype), window_strides=(s,),
            padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
        x = act(_group_norm1(p.get(f"gn{i}"), x))
        if cfg.skip_connections_feat and x.shape[2] == residual.shape[2]:
            tsz, r_tsz = x.shape[1], residual.shape[1]
            residual = residual[:, ::r_tsz // tsz][:, :tsz]
            x = (x + residual) * scale
    if cfg.log_compression:
        x = jnp.log1p(jnp.abs(x))
    return x


def aggregator(variables: Dict[str, Params], cfg: Wav2VecV1Config,
               x: jnp.ndarray, rng=None, deterministic: bool = True
               ) -> jnp.ndarray:
    """(B, T, C) -> (B, T, A): causal conv stack."""
    p = variables["params"]["aggregator"]
    act = _act(cfg)
    scale = math.sqrt(cfg.residual_scale)
    rngs = split_rngs(rng, len(cfg.conv_aggregator_layers))
    for i, (dim, k, s) in enumerate(cfg.conv_aggregator_layers):
        residual = x
        ka = k // 2
        kb = ka - 1 if k % 2 == 0 else ka
        pad = ka + kb
        if cfg.agg_zero_pad:
            xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        else:
            xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode="edge")
        h = jax.lax.conv_general_dilated(
            xp, p[f"conv{i}"]["w"].astype(x.dtype), window_strides=(s,),
            padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
        if "b" in p[f"conv{i}"]:
            h = h + p[f"conv{i}"]["b"].astype(h.dtype)
        h = dropout(h, cfg.dropout, rngs[i], deterministic)
        h = act(_group_norm1(p.get(f"gn{i}"), h))
        if cfg.skip_connections_agg:
            if f"rproj{i}" in p:
                residual = jax.lax.conv_general_dilated(
                    residual, p[f"rproj{i}"]["w"].astype(x.dtype),
                    window_strides=(1,), padding=[(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"))
            h = (h + residual) * scale
        x = h
    return x


def sample_negative_indices(cfg: Wav2VecV1Config, bsz: int, tsz: int,
                            rng: jax.Array) -> jnp.ndarray:
    """The reference's neg_idxs (wav2vec.py:516-545): per (b, n, t) a
    uniform draw over [0, high-1) shifted past self, plus the per-batch
    row offset. Returns flat indices into C x (B*T)."""
    high = tsz if cfg.sample_distance is None else \
        min(tsz, cfg.sample_distance)
    n = cfg.num_negatives
    idxs = jax.random.randint(rng, (bsz, n * tsz), 0, high - 1)
    tszs = jnp.repeat(jnp.arange(tsz), n)[None, :]
    idxs = jnp.where(idxs >= tszs, idxs + 1, idxs)
    idxs = idxs + jnp.arange(bsz)[:, None] * high
    return idxs


def cpc_predictions(variables: Dict[str, Params], cfg: Wav2VecV1Config,
                    x: jnp.ndarray, y: jnp.ndarray,
                    neg_idxs: jnp.ndarray, rng=None,
                    deterministic: bool = True):
    """x (B, T, A) aggregated context; y (B, T, C) features;
    neg_idxs (B, N*T) flat same-sample negative indices.
    Returns (predictions, labels[, weights]) in the reference's
    step-ragged flattened layout."""
    p = variables["params"]["predictions"]
    b, tsz, _ = x.shape
    steps_all = cfg.prediction_steps
    # project_to_steps: (B, T, A) x (A, C, S) -> (B, C, T, S)
    proj = jnp.einsum("bta,acs->bcts", x, p["w"].astype(x.dtype)) \
        + p["b"].astype(x.dtype)[None, :, None, None]
    proj = dropout(proj, cfg.dropout, rng, deterministic)

    # negatives: y (B,T,C) -> flat (C, B*T) gather
    y_cbt = y.transpose(2, 0, 1).reshape(y.shape[2], -1)   # C x (B*T)
    negs = y_cbt[:, neg_idxs.reshape(-1)].reshape(
        y.shape[2], b, cfg.num_negatives, tsz).transpose(2, 1, 0, 3)
    # targets: (copies, B, C, T)
    targets = jnp.concatenate(
        [y.transpose(0, 2, 1)[None], negs], axis=0)
    copies = 1 + cfg.num_negatives

    steps = min(steps_all, tsz - cfg.offset_val)
    preds, labels, weights = [], [], []
    for i in range(steps):
        offset = i + cfg.offset_val
        if cfg.infonce:
            # (tsz-offset, B, copies)
            slab = jnp.einsum("bct,nbct->tbn",
                              proj[:, :, :-offset, i],
                              targets[:, :, :, offset:])
            preds.append(slab.reshape(-1))
        else:
            slab = jnp.einsum("bct,nbct->nbt",
                              proj[:, :, :-offset, i],
                              targets[:, :, :, offset:])
            preds.append(slab.reshape(-1))
            pos_num = (tsz - offset) * b
            lab = jnp.zeros((copies * pos_num,), jnp.float32)
            lab = lab.at[:pos_num].set(1.0)
            labels.append(lab)
            if cfg.balanced_classes:
                w = jnp.full((copies * pos_num,),
                             1.0 / cfg.num_negatives, jnp.float32)
                w = w.at[:pos_num].set(1.0)
                weights.append(w)
    predictions = jnp.concatenate(preds)
    if cfg.infonce:
        predictions = predictions.reshape(-1, copies)
        labels_out = jnp.zeros((predictions.shape[0],), jnp.int32)
        return predictions, labels_out, None
    labels_out = jnp.concatenate(labels)
    w_out = jnp.concatenate(weights) if weights else None
    return predictions, labels_out, w_out


def forward(variables: Dict[str, Params], cfg: Wav2VecV1Config,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False,
            neg_idxs: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
    """batch["source"]: (B, L) raw audio -> cpc logits/targets."""
    r_feat, r_agg, r_neg, r_pred = split_rngs(rng, 4)
    feats = feature_extractor(variables, cfg, batch["source"],
                              deterministic=deterministic)
    extra: Dict[str, Any] = {}
    if cfg.vq_type == "kmeans":
        feats, kmeans_loss, code_ppl = kmeans_vq(
            variables["params"]["vq"], cfg, feats)
        extra = {"kmeans_loss": kmeans_loss, "code_perplexity": code_ppl}
    x = dropout(feats, cfg.dropout_features, r_feat, deterministic)
    x = aggregator(variables, cfg, x, rng=r_agg,
                   deterministic=deterministic)
    x = dropout(x, cfg.dropout_agg, r_agg, deterministic)
    b, tsz = feats.shape[0], feats.shape[1]
    if neg_idxs is None:
        neg_idxs = sample_negative_indices(
            cfg, b, tsz, r_neg if r_neg is not None
            else jax.random.PRNGKey(0))
    preds, labels, weights = cpc_predictions(
        variables, cfg, x, feats, neg_idxs, rng=r_pred,
        deterministic=deterministic)
    return {"cpc_logits": preds, "cpc_targets": labels,
            "cpc_weights": weights, "new_stats": {}, **extra}
