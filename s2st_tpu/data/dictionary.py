"""fairseq-compatible symbol dictionary (parity: fairseq/data/dictionary.py).

Text format: one ``<symbol> <count>`` pair per line. Special symbols are
implicit and prepended on construction: bos=0 ``<s>``, pad=1 ``<pad>``,
eos=2 ``</s>``, unk=3 ``<unk>`` (dictionary.py:29-44).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np


class Dictionary:
    def __init__(self, bos="<s>", pad="<pad>", eos="</s>", unk="<unk>",
                 extra_special_symbols: Optional[Iterable[str]] = None):
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = bos, pad, eos, unk
        self.symbols: List[str] = []
        self.count: List[int] = []
        self.indices: Dict[str, int] = {}
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        for s in extra_special_symbols or []:
            self.add_symbol(s)
        self.nspecial = len(self.symbols)

    def __len__(self):
        return len(self.symbols)

    def __getitem__(self, idx):
        return self.symbols[idx] if idx < len(self.symbols) else self.unk_word

    def __contains__(self, sym):
        return sym in self.indices

    def __eq__(self, other):
        return isinstance(other, Dictionary) and self.indices == other.indices

    def bos(self): return self.bos_index
    def pad(self): return self.pad_index
    def eos(self): return self.eos_index
    def unk(self): return self.unk_index

    def index(self, sym: str) -> int:
        return self.indices.get(sym, self.unk_index)

    def add_symbol(self, word: str, n: int = 1, overwrite: bool = False) -> int:
        if word in self.indices and not overwrite:
            idx = self.indices[word]
            self.count[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.count.append(n)
        return idx

    def finalize(self, threshold: int = -1, nwords: int = -1,
                 padding_factor: int = 8):
        """Sort non-special symbols by count (desc), drop those under
        ``threshold``, keep at most ``nwords`` total, pad the table to a
        multiple of ``padding_factor`` (dictionary.py finalize parity:
        count ties break lexicographically ascending, via the sorted
        Counter insertion order)."""
        if nwords <= 0:
            nwords = len(self)
        tail = sorted(zip(self.symbols[self.nspecial:],
                          self.count[self.nspecial:]))
        tail.sort(key=lambda sc: -sc[1])  # stable: ties stay lexicographic
        symbols = self.symbols[:self.nspecial]
        counts = self.count[:self.nspecial]
        for sym, cnt in tail[:max(0, nwords - self.nspecial)]:
            if cnt < threshold:
                break
            symbols.append(sym)
            counts.append(cnt)
        self.symbols, self.count = symbols, counts
        self.indices = {s: i for i, s in enumerate(symbols)}
        self.pad_to_multiple_(padding_factor)

    def pad_to_multiple_(self, padding_factor: int):
        """Pad with madeupword0000... so len % padding_factor == 0
        (MXU/TensorCore-friendly vocab sizes)."""
        if padding_factor > 1:
            i = 0
            while len(self) % padding_factor != 0:
                self.add_symbol(f"madeupword{i:04d}", n=0)
                i += 1

    def encode_line(self, line: str, append_eos: bool = True,
                    add_if_not_exist: bool = False,
                    tokenizer=None) -> np.ndarray:
        """tokenizer: optional callable splitting the line into symbols
        (reference ``line_tokenizer=``, dictionary.py — e.g. ``list`` for
        per-character protein encoding in EncodedFastaDataset)."""
        words = tokenizer(line) if tokenizer is not None else line.split()
        ids = []
        for w in words:
            ids.append(self.add_symbol(w) if add_if_not_exist else self.index(w))
        if append_eos:
            ids.append(self.eos_index)
        return np.asarray(ids, dtype=np.int32)

    def string(self, tensor, bpe_symbol: Optional[str] = None,
               escape_unk: bool = False, extra_symbols_to_ignore=None) -> str:
        ignore = set(extra_symbols_to_ignore or [])
        ignore.add(self.eos_index)
        ignore.add(self.pad_index)
        toks = [self[int(i)] for i in np.asarray(tensor).reshape(-1)
                if int(i) not in ignore]
        s = " ".join(toks)
        if bpe_symbol == "sentencepiece":
            s = s.replace(" ", "").replace("▁", " ").strip()
        elif bpe_symbol is not None:
            s = (s + " ").replace(bpe_symbol, "").rstrip()
        return s

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        d = cls()
        d.add_from_file(path)
        return d

    def add_from_file(self, path: str):
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip()
                if not line:
                    continue
                try:
                    field, count = line.rsplit(" ", 1)
                    if field == "#fairseq:overwrite":
                        continue
                    self.add_symbol(field, n=int(count))
                except ValueError:
                    raise ValueError(
                        f"Incorrect dictionary format: '{line}'. "
                        "Expected '<token> <cnt>'.")

    def save(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            for sym, cnt in zip(self.symbols[self.nspecial:],
                                self.count[self.nspecial:]):
                f.write(f"{sym} {cnt}\n")
