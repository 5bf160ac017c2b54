"""Multilingual transformer: one transformer per language pair with
optional cross-pair sharing.

Parity: ``fairseq/models/multilingual_transformer.py`` — per-pair
TransformerEncoder/Decoder instances keyed by source/target language
(:142-191), with ``--share-encoder-embeddings`` /
``--share-decoder-embeddings`` (one embedding table across all source /
target languages; requires identical dictionaries, the
FairseqMultiModel.build_shared_embeddings contract) and
``--share-encoders`` / ``--share-decoders`` (whole-module sharing, which
implies shared embeddings, :87-90). Requires ``--task
multilingual_translation``.

TPU design: sharing is expressed in the parameter TREE, not in module
objects — each unique module is stored once (keyed by language, or
"shared") and ``pair_view`` assembles the per-pair {"encoder", "decoder"}
pytree by reference; shared embeddings live in a separate subtree and are
injected into the view. One set of arrays => one set of gradients, so
tied training falls out of the functional design with no parameter
de-duplication pass.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax

from ..nn.core import Params
from . import transformer_text as tt


@dataclass(frozen=True)
class MultilingualConfig:
    lang_pairs: Tuple[str, ...] = ()
    vocab_sizes: Tuple[Tuple[str, int], ...] = ()   # (lang, |dict|)
    base: tt.TransformerTextConfig = dataclasses.field(
        default_factory=tt.TransformerTextConfig)
    share_encoder_embeddings: bool = False
    share_decoder_embeddings: bool = False
    share_encoders: bool = False
    share_decoders: bool = False

    def replace(self, **kw) -> "MultilingualConfig":
        return dataclasses.replace(self, **kw)

    @property
    def src_langs(self) -> Tuple[str, ...]:
        return tuple(p.split("-")[0] for p in self.lang_pairs)

    @property
    def tgt_langs(self) -> Tuple[str, ...]:
        return tuple(p.split("-")[1] for p in self.lang_pairs)

    def vocab(self, lang: str) -> int:
        return dict(self.vocab_sizes)[lang]

    def enc_key(self, lang: str) -> str:
        return "shared" if self.share_encoders else lang

    def dec_key(self, lang: str) -> str:
        return "shared" if self.share_decoders else lang

    def pair_cfg(self, pair: str) -> tt.TransformerTextConfig:
        src, tgt = pair.split("-")
        return self.base.replace(src_vocab_size=self.vocab(src),
                                 tgt_vocab_size=self.vocab(tgt))

    @property
    def share_enc_emb(self) -> bool:
        return self.share_encoder_embeddings or self.share_encoders

    @property
    def share_dec_emb(self) -> bool:
        return self.share_decoder_embeddings or self.share_decoders


def _check_shared_vocab(cfg: MultilingualConfig, langs, what):
    sizes = {cfg.vocab(lg) for lg in langs}
    if len(sizes) > 1:
        raise ValueError(
            f"--share-{what}-embeddings requires identical dictionaries "
            f"across {sorted(set(langs))} (sizes {sorted(sizes)})")


def init_multilingual(key, cfg: MultilingualConfig) -> Dict[str, Params]:
    """params = {"encoders": {key: enc_tree}, "decoders": {key: dec_tree},
    "shared": optional {"enc_embed","dec_embed"}}."""
    enc_trees: Dict[str, Params] = {}
    dec_trees: Dict[str, Params] = {}
    shared: Dict[str, Params] = {}

    if cfg.share_enc_emb:
        _check_shared_vocab(cfg, cfg.src_langs, "encoder")
    if cfg.share_dec_emb:
        _check_shared_vocab(cfg, cfg.tgt_langs, "decoder")

    i = 0
    for pair in cfg.lang_pairs:
        src, tgt = pair.split("-")
        ek, dk = cfg.enc_key(src), cfg.dec_key(tgt)
        if ek not in enc_trees:
            full = tt.init_transformer(jax.random.fold_in(key, i),
                                       cfg.pair_cfg(pair))
            i += 1
            enc_trees[ek] = full["params"]["encoder"]
            if cfg.share_enc_emb:
                if "enc_embed" not in shared:
                    shared["enc_embed"] = enc_trees[ek]["embed"]
                enc_trees[ek] = {k: v for k, v in enc_trees[ek].items()
                                 if k != "embed"}
        if dk not in dec_trees:
            full = tt.init_transformer(jax.random.fold_in(key, i),
                                       cfg.pair_cfg(pair))
            i += 1
            dec = dict(full["params"]["decoder"])
            if "embed" not in dec:      # share_all_embeddings fallback
                dec["embed"] = full["params"]["encoder"]["embed"]
            if cfg.share_dec_emb:
                if "dec_embed" not in shared:
                    shared["dec_embed"] = dec["embed"]
                dec = {k: v for k, v in dec.items() if k != "embed"}
            dec_trees[dk] = dec
    params: Params = {"encoders": enc_trees, "decoders": dec_trees}
    if shared:
        params["shared"] = shared
    return {"params": params, "stats": {}}


def pair_view(variables: Dict[str, Params], cfg: MultilingualConfig,
              pair: str):
    """Assemble the per-pair (variables, cfg) view the shared
    transformer_text functions consume. Pure tree references — no copies."""
    p = variables["params"]
    src, tgt = pair.split("-")
    enc = dict(p["encoders"][cfg.enc_key(src)])
    dec = dict(p["decoders"][cfg.dec_key(tgt)])
    if cfg.share_enc_emb:
        enc["embed"] = p["shared"]["enc_embed"]
    if cfg.share_dec_emb:
        dec["embed"] = p["shared"]["dec_embed"]
    view = {"params": {"encoder": enc, "decoder": dec},
            "stats": variables.get("stats", {})}
    return view, cfg.pair_cfg(pair)


def forward(variables: Dict[str, Params], cfg: MultilingualConfig,
            batch: Dict[str, Any], pair: str, rng=None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    view, pcfg = pair_view(variables, cfg, pair)
    return tt.forward(view, pcfg, batch, rng=rng,
                      deterministic=deterministic, train=train)
