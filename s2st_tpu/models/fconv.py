"""ConvS2S — the fconv model family (Gehring et al., 2017).

Parity: fairseq/models/fconv.py (FConvModel/FConvEncoder/FConvDecoder/
AttentionLayer :30-640, helpers :640-699, archs :699-756) and
fairseq/models/fconv_lm.py (decoder-only LM). Numerics follow the
reference exactly: weight-normalized linears/convs (folded at import;
our init draws the reference's std formulas directly), GLU conv blocks
with sqrt(0.5)-scaled residuals from `residual` layers back, per-layer
dot attention against (encoder_out, encoder_out+input_embedding) with
the 1/sqrt(s) valid-length rescale, learned pad-aware positional
embeddings, and the encoder-output GradMultiply 1/(2*num_attn_layers).

TPU-first: convolutions are framed as GEMMs over a rolled stack (the
(K, Cin, Cout) kernel contracts one einsum — XLA maps it onto the MXU;
conv_tbc's gemm trick IS this), the whole decoder runs teacher-forced in
one fused graph, and incremental beam decode keeps a per-layer (K-1)-step
ring buffer in the jitted loop via the generic step-fn beam interface.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.core import Params, dropout, embedding

PAD, EOS = 1, 2
NEG_INF = -1e9


@dataclass(frozen=True)
class FConvConfig:
    src_vocab: int = 64
    tgt_vocab: int = 64
    encoder_embed_dim: int = 512
    decoder_embed_dim: int = 512
    decoder_out_embed_dim: int = 256
    encoder_convs: Tuple[Tuple[int, int, int], ...] = ((512, 3, 1),) * 20
    decoder_convs: Tuple[Tuple[int, int, int], ...] = ((512, 3, 1),) * 20
    decoder_attention: Tuple[bool, ...] = ()      # () -> all True
    dropout: float = 0.1
    share_input_output_embed: bool = False
    positional_embeddings: bool = True
    max_source_positions: int = 1024
    max_target_positions: int = 1024
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "FConvConfig":
        return dataclasses.replace(self, **kw)

    @property
    def attention_flags(self) -> Tuple[bool, ...]:
        return self.decoder_attention or (True,) * len(self.decoder_convs)


def extend_conv_spec(spec) -> Tuple[Tuple[int, int, int], ...]:
    """(out, k) -> (out, k, 1); (out, k, residual) passes through
    (fconv.py:633-655)."""
    out = []
    for s in spec:
        s = tuple(s)
        if len(s) == 2:
            s = s + (1,)
        assert len(s) == 3, f"bad conv spec {s}"
        out.append(s)
    return tuple(out)


# ---------------------------------------------------------------------------
# init (reference std formulas, fconv.py:657-697)
# ---------------------------------------------------------------------------

def _emb(key, n, dim):
    w = jax.random.normal(key, (n, dim)) * 0.1
    return {"w": w.at[PAD].set(0.0)}


def _linear(key, i, o, dropout_p=0.0):
    std = math.sqrt((1 - dropout_p) / i)
    return {"w": jax.random.normal(key, (i, o)) * std, "b": jnp.zeros((o,))}


def _conv(key, i, o, k, dropout_p=0.0):
    std = math.sqrt((4 * (1.0 - dropout_p)) / (k * i))
    return {"w": jax.random.normal(key, (k, i, o)) * std,
            "b": jnp.zeros((o,))}


def _stack_params(key, convs, embed_dim, dropout_p, attention=None,
                  src_vocab=0):
    """Shared conv-stack param builder for encoder/decoder."""
    p: Dict[str, Params] = {}
    keys = jax.random.split(key, 3 * len(convs) + 4)
    in_ch = convs[0][0]
    p["fc1"] = _linear(keys[0], embed_dim, in_ch, dropout_p)
    layer_in = [in_ch]
    for i, (out_ch, ksz, res) in enumerate(convs):
        res_dim = out_ch if res == 0 else layer_in[-res]
        if res_dim != out_ch:
            p[f"proj{i}"] = _linear(keys[3 * i + 1], res_dim, out_ch)
        p[f"conv{i}"] = _conv(keys[3 * i + 2], in_ch, out_ch * 2, ksz,
                              dropout_p)
        if attention is not None and attention[i]:
            p[f"attn{i}"] = {
                "in_proj": _linear(keys[3 * i + 3], out_ch, embed_dim),
                "out_proj": _linear(
                    jax.random.fold_in(keys[3 * i + 3], 7), embed_dim,
                    out_ch)}
        in_ch = out_ch
        layer_in.append(out_ch)
    return p, in_ch


def init_fconv(key, cfg: FConvConfig) -> Dict[str, Params]:
    ks = jax.random.split(key, 10)
    enc: Dict[str, Params] = {"embed": _emb(ks[0], cfg.src_vocab,
                                            cfg.encoder_embed_dim)}
    if cfg.positional_embeddings:
        enc["pos"] = _emb(ks[1], cfg.max_source_positions,
                          cfg.encoder_embed_dim)
    stack, in_ch = _stack_params(ks[2], cfg.encoder_convs,
                                 cfg.encoder_embed_dim, cfg.dropout)
    enc.update(stack)
    enc["fc2"] = _linear(ks[3], in_ch, cfg.encoder_embed_dim)

    dec: Dict[str, Params] = {"embed": _emb(ks[4], cfg.tgt_vocab,
                                            cfg.decoder_embed_dim)}
    if cfg.positional_embeddings:
        dec["pos"] = _emb(ks[5], cfg.max_target_positions,
                          cfg.decoder_embed_dim)
    stack, in_ch = _stack_params(ks[6], cfg.decoder_convs,
                                 cfg.decoder_embed_dim, cfg.dropout,
                                 attention=cfg.attention_flags)
    dec.update(stack)
    dec["fc2"] = _linear(ks[7], in_ch, cfg.decoder_out_embed_dim)
    if not cfg.share_input_output_embed:
        dec["fc3"] = _linear(ks[8], cfg.decoder_out_embed_dim,
                             cfg.tgt_vocab, cfg.dropout)
    return {"params": {"encoder": enc, "decoder": dec}, "stats": {}}


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _lin(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def _conv_tbc(p, x: jnp.ndarray, pad_l: int, pad_r: int) -> jnp.ndarray:
    """Batch-major temporal conv as one einsum over a rolled stack:
    x (B, T, Cin), kernel (K, Cin, Cout). Pads time by (pad_l, pad_r)."""
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    t_out = xp.shape[1] - k + 1
    frames = jnp.stack([xp[:, i:i + t_out] for i in range(k)], axis=2)
    return jnp.einsum("btkc,kcd->btd", frames, w) + p["b"].astype(x.dtype)


def _positions(tokens: jnp.ndarray) -> jnp.ndarray:
    """utils.make_positions: pad-aware cumulative positions; pads read the
    zeroed PAD row of the table."""
    is_pad = tokens == PAD
    cum = jnp.cumsum((~is_pad).astype(jnp.int32), axis=1)
    return jnp.where(is_pad, PAD, cum + PAD)


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def encode(variables: Dict[str, Params], cfg: FConvConfig,
           src_tokens: jnp.ndarray, rng=None, deterministic: bool = True
           ) -> Dict[str, jnp.ndarray]:
    """FConvEncoder.forward (fconv.py:224-305). Returns encoder_a (x),
    encoder_b (x+emb scaled) both (B, Ts, E), and the padding mask."""
    p = variables["params"]["encoder"]
    convs = extend_conv_spec(cfg.encoder_convs)
    n_attn = sum(cfg.attention_flags)
    det = deterministic or rng is None
    r = jax.random.split(rng, len(convs) + 1) if not det \
        else [None] * (len(convs) + 1)
    x = embedding(p["embed"], src_tokens, cfg.dtype)
    if "pos" in p:
        x = x + p["pos"]["w"].astype(cfg.dtype)[_positions(src_tokens)]
    x = dropout(x, cfg.dropout, r[0], det)
    input_embedding = x
    x = _lin(p["fc1"], x)
    pad_mask = (src_tokens == PAD)[:, :, None]

    residuals = [x]
    for i, (out_ch, ksz, res) in enumerate(convs):
        if res > 0:
            residual = residuals[-res]
            if f"proj{i}" in p:
                residual = _lin(p[f"proj{i}"], residual)
        else:
            residual = None
        x = jnp.where(pad_mask, 0.0, x)
        x = dropout(x, cfg.dropout, r[i + 1], det)
        if ksz % 2 == 1:
            x = _conv_tbc(p[f"conv{i}"], x, ksz // 2, ksz // 2)
        else:
            x = _conv_tbc(p[f"conv{i}"], x, (ksz - 1) // 2, ksz // 2)
        x = _glu(x)
        if residual is not None:
            x = (x + residual) * math.sqrt(0.5)
        residuals.append(x)

    x = _lin(p["fc2"], x)
    x = jnp.where(pad_mask, 0.0, x)
    # GradMultiply 1/(2*num_attention_layers) (fconv.py:300-301)
    if n_attn > 0:
        c = 1.0 / (2.0 * n_attn)
        x = x * c + jax.lax.stop_gradient(x) * (1.0 - c)
    y = (x + input_embedding) * math.sqrt(0.5)
    return {"encoder_a": x, "encoder_b": y,
            "encoder_padding_mask": src_tokens == PAD}


def _attention(attn_p, x, target_embedding, enc_a, enc_b, enc_pad):
    """AttentionLayer.forward (fconv.py:335-371). x (B,Tt,C)."""
    residual = x
    q = (_lin(attn_p["in_proj"], x) + target_embedding) * math.sqrt(0.5)
    scores = jnp.einsum("bte,bse->bts", q, enc_a)
    scores = jnp.where(enc_pad[:, None, :], NEG_INF, scores)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    attn = attn.astype(x.dtype)
    out = jnp.einsum("bts,bse->bte", attn, enc_b)
    s = enc_b.shape[1] - jnp.sum(enc_pad, axis=1, keepdims=True)
    s = jnp.maximum(s, 1).astype(out.dtype)[:, :, None]
    out = out * (s * jax.lax.rsqrt(s))
    x = (_lin(attn_p["out_proj"], out) + residual) * math.sqrt(0.5)
    return x, attn


def _decoder_stack(p, cfg: FConvConfig, x, target_embedding, enc, rng, det,
                   caches: Optional[List] = None, step=None):
    """Shared teacher-forced / incremental decoder conv stack.
    Teacher-forced: x (B, Tt, E), causal left-pad k-1.
    Incremental: x (N, 1, E) with per-layer (K-1)-frame ring caches."""
    convs = extend_conv_spec(cfg.decoder_convs)
    flags = cfg.attention_flags
    n_attn = sum(flags)
    r = jax.random.split(rng, len(convs)) if rng is not None \
        else [None] * len(convs)
    x = _lin(p["fc1"], x)
    avg_attn = None
    residuals = [x]
    new_caches = []
    for i, (out_ch, ksz, res) in enumerate(convs):
        if res > 0:
            residual = residuals[-res]
            if f"proj{i}" in p:
                residual = _lin(p[f"proj{i}"], residual)
        else:
            residual = None
        x = dropout(x, cfg.dropout, r[i], det)
        if caches is None:
            x = _conv_tbc(p[f"conv{i}"], x, ksz - 1, 0)
        else:
            buf = caches[i]                       # (N, K-1, Cin)
            xin = jnp.concatenate([buf, x], axis=1) if ksz > 1 else x
            new_caches.append(xin[:, 1:] if ksz > 1 else buf)
            x = _conv_tbc(p[f"conv{i}"], xin, 0, 0)
        x = _glu(x)
        if flags[i]:
            x, attn = _attention(p[f"attn{i}"], x, target_embedding,
                                 enc["encoder_a"], enc["encoder_b"],
                                 enc["encoder_padding_mask"])
            attn = attn / n_attn
            avg_attn = attn if avg_attn is None else avg_attn + attn
        if residual is not None:
            x = (x + residual) * math.sqrt(0.5)
        residuals.append(x)
    return x, avg_attn, new_caches


def _output_layer(p, cfg: FConvConfig, x, rng, det):
    x = _lin(p["fc2"], x)
    x = dropout(x, cfg.dropout, rng, det)
    if "fc3" in p:
        return _lin(p["fc3"], x)
    return jnp.dot(x, p["embed"]["w"].astype(x.dtype).T)


def forward(variables: Dict[str, Params], cfg: FConvConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """Teacher-forced forward -> {"logits": (B, Tt, V), "attn"}."""
    det = deterministic or rng is None
    r = jax.random.split(rng, 4) if not det else (None,) * 4
    enc = encode(variables, cfg, batch["src_tokens"], rng=r[0],
                 deterministic=det)
    p = variables["params"]["decoder"]
    prev = batch["prev_output_tokens"]
    x = embedding(p["embed"], prev, cfg.dtype)
    if "pos" in p:
        x = x + p["pos"]["w"].astype(cfg.dtype)[_positions(prev)]
    x = dropout(x, cfg.dropout, r[1], det)
    target_embedding = x
    x, avg_attn, _ = _decoder_stack(p, cfg, x, target_embedding, enc,
                                    r[2], det)
    logits = _output_layer(p, cfg, x, r[3], det)
    return {"logits": logits, "attn": avg_attn, "new_stats": {}}


# ---------------------------------------------------------------------------
# incremental beam interface (generic step-fn)
# ---------------------------------------------------------------------------

def init_beam_cache(variables, cfg: FConvConfig, enc, beam: int):
    """Per-layer (K-1)-frame conv ring buffers tiled to N = B*K."""
    convs = extend_conv_spec(cfg.decoder_convs)
    b = enc["encoder_a"].shape[0]
    caches = {}
    in_ch = convs[0][0]
    for i, (out_ch, ksz, _res) in enumerate(convs):
        caches[f"buf{i}"] = jnp.zeros((b * beam, max(ksz - 1, 0), in_ch),
                                      cfg.dtype)
        in_ch = out_ch
    return caches


def make_beam_step(variables, cfg: FConvConfig, enc_tiled):
    """(tokens_t (N,1), step, cache) -> (lprobs (N,V), cache). ``enc_tiled``
    holds encoder_a/b + padding mask already repeated K-fold."""
    p = variables["params"]["decoder"]
    convs = extend_conv_spec(cfg.decoder_convs)

    def step_fn(tokens_t, step, cache):
        x = embedding(p["embed"], tokens_t, cfg.dtype)     # (N, 1, E)
        if "pos" in p:
            # incremental positions: padding_idx + step + 1
            x = x + p["pos"]["w"].astype(cfg.dtype)[PAD + 1 + step][None,
                                                                    None]
        target_embedding = x
        caches = [cache[f"buf{i}"] for i in range(len(convs))]
        x, _, new = _decoder_stack(p, cfg, x, target_embedding, enc_tiled,
                                   None, True, caches=caches, step=step)
        logits = _output_layer(p, cfg, x, None, True)[:, 0]
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return lprobs, {f"buf{i}": new[i] for i in range(len(convs))}

    return step_fn


# ---------------------------------------------------------------------------
# torch import (weight-norm folding)
# ---------------------------------------------------------------------------

def _fold_wn(sd, prefix, dim):
    g = sd[prefix + ".weight_g"]
    v = sd[prefix + ".weight_v"]
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def load_torch_fconv(path_or_sd, cfg: FConvConfig) -> Dict[str, Params]:
    """Import a fairseq FConvModel state_dict (weight-norm folded;
    Linear wn dim=0, ConvTBC/LinearizedConv1d wn dim=2)."""
    if isinstance(path_or_sd, dict):
        sd = path_or_sd
    else:
        import torch
        state = torch.load(path_or_sd, map_location="cpu",
                           weights_only=False)
        sd = state["model"] if "model" in state else state
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def lin(prefix):
        if prefix + ".weight_g" in sd:
            w = _fold_wn(sd, prefix, 0)
        else:
            w = sd[prefix + ".weight"]
        return {"w": jnp.asarray(w.T.copy()),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def conv(prefix):
        w = _fold_wn(sd, prefix, 2) if prefix + ".weight_g" in sd \
            else sd[prefix + ".weight"]
        return {"w": jnp.asarray(w), "b": jnp.asarray(sd[prefix + ".bias"])}

    def side(name, convs, attention=None):
        p: Dict[str, Params] = {
            "embed": {"w": jnp.asarray(sd[f"{name}.embed_tokens.weight"])}}
        if f"{name}.embed_positions.weight" in sd:
            p["pos"] = {"w": jnp.asarray(
                sd[f"{name}.embed_positions.weight"])}
        p["fc1"] = lin(f"{name}.fc1")
        for i in range(len(convs)):
            if f"{name}.projections.{i}.weight_g" in sd or \
                    f"{name}.projections.{i}.weight" in sd:
                p[f"proj{i}"] = lin(f"{name}.projections.{i}")
            p[f"conv{i}"] = conv(f"{name}.convolutions.{i}")
            if attention is not None and attention[i]:
                p[f"attn{i}"] = {
                    "in_proj": lin(f"{name}.attention.{i}.in_projection"),
                    "out_proj": lin(f"{name}.attention.{i}.out_projection")}
        if f"{name}.fc2.weight_g" in sd or f"{name}.fc2.weight" in sd:
            p["fc2"] = lin(f"{name}.fc2")
        if f"{name}.fc3.weight_g" in sd:
            p["fc3"] = lin(f"{name}.fc3")
        elif f"{name}.fc3.weight" in sd:
            p["fc3"] = {"w": jnp.asarray(sd[f"{name}.fc3.weight"].T.copy()),
                        "b": jnp.asarray(sd[f"{name}.fc3.bias"])}
        return p

    dec = side("decoder", extend_conv_spec(cfg.decoder_convs),
               cfg.attention_flags)
    p = {"decoder": dec}
    if any(k.startswith("encoder.") for k in sd):   # absent for fconv_lm
        p["encoder"] = side("encoder", extend_conv_spec(cfg.encoder_convs))
    return {"params": p, "stats": {}}


# ---------------------------------------------------------------------------
# fconv_lm (fairseq/models/fconv_lm.py): decoder-only, no positions,
# no attention, out_embed_dim = embed_dim
# ---------------------------------------------------------------------------

def init_fconv_lm(key, cfg: FConvConfig) -> Dict[str, Params]:
    """FConvLanguageModel.build_model (fconv_lm.py:64-92): an FConvDecoder
    with positional_embeddings=False and attention [False]*n."""
    ks = jax.random.split(key, 4)
    dec: Dict[str, Params] = {"embed": _emb(ks[0], cfg.tgt_vocab,
                                            cfg.decoder_embed_dim)}
    stack, in_ch = _stack_params(ks[1], cfg.decoder_convs,
                                 cfg.decoder_embed_dim, cfg.dropout)
    dec.update(stack)
    dec["fc2"] = _linear(ks[2], in_ch, cfg.decoder_out_embed_dim)
    dec["fc3"] = _linear(ks[3], cfg.decoder_out_embed_dim, cfg.tgt_vocab,
                         cfg.dropout)
    return {"params": {"decoder": dec}, "stats": {}}


def forward_lm(variables: Dict[str, Params], cfg: FConvConfig,
               batch: Dict[str, Any], rng: Optional[jax.Array] = None,
               deterministic: bool = True, train: bool = False
               ) -> Dict[str, Any]:
    """FConvDecoder.forward with encoder_out=None (fconv.py:490-570)."""
    det = deterministic or rng is None
    r = jax.random.split(rng, 3) if not det else (None,) * 3
    p = variables["params"]["decoder"]
    prev = batch["src_tokens"]
    x = embedding(p["embed"], prev, cfg.dtype)
    x = dropout(x, cfg.dropout, r[0], det)
    x, _, _ = _decoder_stack(p, cfg, x, x, None, r[1], det)
    logits = _output_layer(p, cfg, x, r[2], det)
    return {"logits": logits, "new_stats": {}}
