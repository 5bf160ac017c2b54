"""sentencepiece train/encode/decode CLIs (parity: scripts/spm_train.py,
spm_encode.py, spm_decode.py). Thin wrappers over the same sentencepiece
library the reference wraps; gated on it being installed (it is not baked
into this image). Exposed as console entry points:

    python -m s2st_tpu.cli.spm train  -- --input=... --model_prefix=...
    python -m s2st_tpu.cli.spm encode --model m.model --inputs a.txt ...
    python -m s2st_tpu.cli.spm decode --model m.model --input enc.txt
"""

from __future__ import annotations

import argparse
import contextlib
import sys
from typing import List, Optional


def _spm():
    try:
        import sentencepiece as spm
        return spm
    except ImportError as e:
        raise ImportError(
            "sentencepiece is not installed in this image; spm train/"
            "encode/decode need it") from e


def train(argv: List[str]) -> int:
    # spm_train.py parity: raw passthrough of trainer flags
    _spm().SentencePieceTrainer.Train(" ".join(argv))
    return 0


def _open_out(path):
    return (contextlib.nullcontext(sys.stdout) if path == "-"
            else open(path, "w", encoding="utf-8"))


def _open_in(path):
    return (contextlib.nullcontext(sys.stdin) if path == "-"
            else open(path, encoding="utf-8"))


def encode(argv: List[str]) -> int:
    p = argparse.ArgumentParser("spm encode")
    p.add_argument("--model", required=True)
    p.add_argument("--inputs", nargs="+", default=["-"])
    p.add_argument("--outputs", nargs="+", default=["-"])
    p.add_argument("--output_format", choices=["piece", "id"],
                   default="piece")
    p.add_argument("--min-len", type=int, default=None)
    p.add_argument("--max-len", type=int, default=None)
    p.add_argument("--keep-empty", action="store_true",
                   help="keep empty lines (dropped by default, as the "
                        "reference spm_encode.py does)")
    args = p.parse_args(argv)
    assert len(args.inputs) == len(args.outputs), \
        "number of input and output paths should match"

    sp = _spm().SentencePieceProcessor()
    sp.Load(args.model)
    if args.output_format == "piece":
        enc = lambda line: list(map(str, sp.EncodeAsPieces(line)))
    else:
        enc = lambda line: list(map(str, sp.EncodeAsIds(line)))

    def encode_line(line):
        """Stripped-line encode; None filters the whole parallel row
        (reference spm_encode.py semantics: empty lines dropped unless
        --keep-empty, length bounds checked on the encoded pieces)."""
        line = line.strip()
        if not line:
            return [] if args.keep_empty else None
        toks = enc(line)
        if ((args.min_len is not None and len(toks) < args.min_len)
                or (args.max_len is not None and len(toks) > args.max_len)):
            return None
        return toks

    with contextlib.ExitStack() as stack:
        ins = [stack.enter_context(_open_in(f)) for f in args.inputs]
        outs = [stack.enter_context(_open_out(f)) for f in args.outputs]
        stats = {"kept": 0, "filtered": 0}
        for lines in zip(*ins):
            encs = [encode_line(line) for line in lines]
            if not any(e is None for e in encs):
                stats["kept"] += 1
                for e, out in zip(encs, outs):
                    print(" ".join(e), file=out)
            else:
                stats["filtered"] += 1
        print(f"kept {stats['kept']} / filtered {stats['filtered']}",
              file=sys.stderr)
    return 0


def decode(argv: List[str]) -> int:
    p = argparse.ArgumentParser("spm decode")
    p.add_argument("--model", required=True)
    p.add_argument("--input", default="-")
    p.add_argument("--input_format", choices=["piece", "id"],
                   default="piece")
    args = p.parse_args(argv)

    sp = _spm().SentencePieceProcessor()
    sp.Load(args.model)
    if args.input_format == "piece":
        dec = lambda toks: "".join(sp.DecodePieces(toks))
    else:
        dec = lambda toks: "".join(sp.DecodeIds(list(map(int, toks))))

    with _open_in(args.input) as f:
        for line in f:
            print(dec(line.split()))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("train", "encode", "decode"):
        print("usage: spm {train,encode,decode} [args...]", file=sys.stderr)
        return 2
    return {"train": train, "encode": encode,
            "decode": decode}[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
