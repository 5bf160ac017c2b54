"""Speech-to-text transformer (ASR/ST pretraining stage).

Parity: ``fairseq/models/speech_to_text/s2t_transformer.py`` and the
``s2t_transformer_hubert`` variant (``s2t_transformer_me.py:82``) used by
run_mix_tuning.sh / run_prompt_tuning.sh ST pretraining: the same speech
encoder as the S2ST model (optional frozen HuBERT -> Conv1d GLU subsampler
-> transformer), plus a standard text transformer decoder over the final
encoder output.

The encoder is literally ``s2st_transformer.encode`` (shared params layout:
a warm-started S2T encoder drops into the S2ST model via
``load_pretrained_component`` — the prompt-tuning recipe's
``--load-pretrained-encoder-from`` path); the decoder reuses the aux-decoder
machinery (embed + transformer layers + output projection).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.core import Params, split_rngs
from . import s2st_transformer as s2st

PAD = s2st.PAD


@dataclass(frozen=True)
class S2TConfig:
    base: s2st.S2STConfig = dataclasses.field(
        default_factory=s2st.S2STConfig)
    decoder_layers: int = 6
    decoder_embed_dim: int = 256

    def replace(self, **kw) -> "S2TConfig":
        return dataclasses.replace(self, **kw)


def init_s2t(key, cfg: S2TConfig, vocab_size: Optional[int] = None
             ) -> Dict[str, Params]:
    base = cfg.base.replace(aux_asr=False, aux_st=False, ctc=False,
                            middle_layers=())
    k_base, k_dec = jax.random.split(key)
    base_vars = s2st.init_s2st(k_base, base)
    vocab = vocab_size or base.tgt_vocab_size
    params: Params = {"encoder": base_vars["params"]["encoder"],
                      "decoder": s2st._aux_decoder_init(
                          k_dec, base, vocab, cfg.decoder_embed_dim,
                          cfg.decoder_layers)}
    if "hubert" in base_vars["params"]:
        params["hubert"] = base_vars["params"]["hubert"]
    return {"params": params, "stats": {}}


def forward(variables: Dict[str, Params], cfg: S2TConfig,
            batch: Dict[str, Any], rng: Optional[jax.Array] = None,
            deterministic: bool = True, train: bool = False
            ) -> Dict[str, Any]:
    """batch: src_speech (B,T,F) or raw wave, src_speech_lens, and
    prev_output text tokens under ``prev_tgt_text_tokens`` (st) or
    ``prev_src_text_tokens`` (asr) — the criterion picks via test_type.
    Returns {"logits": (B, Tt, V), "encoder_*": ...}."""
    r_enc, r_dec = split_rngs(rng, 2)
    enc = s2st.encode(variables, cfg.base, batch["src_speech"],
                      batch["src_speech_lens"], speaker=batch.get("speaker"),
                      rng=r_enc, deterministic=deterministic)
    prev = batch.get("prev_text_tokens")
    if prev is None:
        prev = batch.get("prev_tgt_text_tokens",
                         batch.get("prev_src_text_tokens"))
    logits = s2st.aux_decode(
        variables["params"]["decoder"], cfg.base, cfg.decoder_embed_dim,
        cfg.decoder_layers, prev, enc["encoder_out"],
        enc["encoder_padding_mask"], rng=r_dec, deterministic=deterministic)
    return {
        "logits": logits,
        "encoder_out": enc["encoder_out"],
        "encoder_padding_mask": enc["encoder_padding_mask"],
        "encoder_out_lengths": enc["out_lengths"],
        "new_stats": {},
    }
