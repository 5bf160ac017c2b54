"""Shared TSV manifest helpers for the preprocessing tools
(reference: examples/speech_to_text/data_utils.py load_tsv_to_dicts /
save_df_to_tsv — rebuilt without the pandas dependency)."""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Iterable, List

MANIFEST_COLUMNS = ["id", "src_audio", "src_n_frames", "src_text",
                    "tgt_audio", "tgt_n_frames", "tgt_text", "speaker"]


def load_tsv(path) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        return [dict(e) for e in csv.DictReader(
            f, delimiter="\t", quoting=csv.QUOTE_NONE)]


def save_tsv(rows: Iterable[Dict[str, str]], path,
             columns: List[str] = None) -> None:
    rows = list(rows)
    if not rows:
        Path(path).write_text("")
        return
    cols = columns or list(rows[0].keys())

    def scrub(v):
        # TSV fields cannot carry tabs/newlines; QUOTE_NONE with
        # quotechar=None writes everything else verbatim (quotes in
        # transcripts would otherwise raise "need to escape" mid-run)
        if isinstance(v, str) and any(c in v for c in "\t\n\r"):
            return " ".join(v.split())
        return v

    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=cols, delimiter="\t",
                           quoting=csv.QUOTE_NONE, quotechar=None,
                           extrasaction="ignore")
        w.writeheader()
        w.writerows([{k: scrub(v) for k, v in r.items()} for r in rows])
