"""Grapheme-to-phoneme manifest rewriting
(reference: examples/s2s_trans/preprocessing/g2p.py — English side through
tacotron cleaners + g2p_en/IPA, Chinese side through cn_tn + per-char
pypinyin initials/finals with TONE3).

The phonemizer backends (pypinyin / g2p_en) are optional external
dependencies; when absent, ``--backend chars`` provides a hermetic
fallback (normalized text split into characters for zh / words for en) so
recipes remain runnable end-to-end. Behavior with the real backends mirrors
the reference: rows whose tgt_text contains latin characters are dropped
(g2p.py:45-48), the zh text is cn_tn-normalized, stripped to
[0-9A-Za-z一-龥], '|'-joined per char, then phonemized.
"""

from __future__ import annotations

import argparse
import logging
import re
import sys
from typing import List, Optional

from .cn_text_norm import normalize as cn_normalize
from .manifest_utils import MANIFEST_COLUMNS, load_tsv, save_tsv

logger = logging.getLogger("s2st_tpu.g2p")

_EN_CHAR = re.compile(r"[A-Za-z]")
_NON_WORD = re.compile(r"[^0-9A-Za-z一-龥]")

# lightweight english cleaner (tacotron custom_english_cleaners essentials:
# lowercase, collapse whitespace, expand a few abbreviations)
_ABBREV = [(re.compile(rf"\b{a}\.", re.IGNORECASE), b) for a, b in [
    ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
    ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
    ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
    ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
    ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"),
    ("ft", "fort")]]


def clean_english(text: str) -> str:
    for pat, repl in _ABBREV:
        text = pat.sub(repl, text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.lower()


def phonemize_en(text: str, backend: str) -> str:
    text = clean_english(text)
    if backend == "g2p_en":
        from g2p_en import G2p  # optional dep
        phones = [p for p in G2p()(text) if p != " "]
        return " ".join(phones)
    return text  # chars/words fallback


def pinyin_phones(text: str) -> List[str]:
    """Per-char pypinyin TONE3 initials+finals (g2p.py:18-33)."""
    from pypinyin import pinyin, Style  # optional dep
    from pypinyin.style._utils import get_finals, get_initials
    out = []
    for syl in pinyin(text, style=Style.TONE3):
        for part in (get_initials(syl[0], strict=True),
                     get_finals(syl[0], strict=True)):
            if part:
                out.append(part)
    return out


def phonemize_zh(text: str, backend: str) -> str:
    norm = cn_normalize(text.replace(" ", ""))
    norm = _NON_WORD.sub("", norm)
    if backend == "pypinyin":
        joined = "|".join(norm)   # char separator, as the reference builds
        return " ".join(pinyin_phones(joined))
    return " ".join(norm)         # chars fallback


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    p = argparse.ArgumentParser("s2st_tpu g2p")
    p.add_argument("--input-file", required=True)
    p.add_argument("--output-file", required=True)
    p.add_argument("--src-backend", default="auto",
                   choices=["auto", "g2p_en", "chars"])
    p.add_argument("--tgt-backend", default="auto",
                   choices=["auto", "pypinyin", "chars"])
    p.add_argument("--keep-latin-tgt", action="store_true",
                   help="keep rows whose tgt_text contains latin chars "
                        "(the reference drops them)")
    args = p.parse_args(argv)

    src_backend, tgt_backend = args.src_backend, args.tgt_backend
    if src_backend == "auto":
        try:
            import g2p_en  # noqa: F401
            src_backend = "g2p_en"
        except ImportError:
            src_backend = "chars"
            logger.warning("g2p_en unavailable -> src words fallback")
    if tgt_backend == "auto":
        try:
            import pypinyin  # noqa: F401
            tgt_backend = "pypinyin"
        except ImportError:
            tgt_backend = "chars"
            logger.warning("pypinyin unavailable -> tgt chars fallback")

    rows_out = []
    dropped = 0
    for s in load_tsv(args.input_file):
        if not args.keep_latin_tgt and _EN_CHAR.search(s["tgt_text"]):
            logger.info(f"latin chars in tgt of id {s['id']}; dropped")
            dropped += 1
            continue
        row = dict(s)
        row["src_text"] = phonemize_en(s["src_text"], src_backend)
        row["tgt_text"] = phonemize_zh(s["tgt_text"], tgt_backend)
        rows_out.append(row)
    cols = [c for c in MANIFEST_COLUMNS if rows_out and c in rows_out[0]]
    save_tsv(rows_out, args.output_file, columns=cols or None)
    logger.info(f"wrote {len(rows_out)} rows ({dropped} dropped) "
                f"-> {args.output_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
