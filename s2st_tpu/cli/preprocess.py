"""Binarize parallel text with fairseq-preprocess-compatible output
(parity: fairseq_cli/preprocess.py).

Builds/saves dictionaries (threshold / nwords / padding-factor /
--joined-dictionary / --srcdict/--tgtdict / --dict-only) and binarizes
train/valid/test prefixes into ``{split}.{src}-{tgt}.{lang}.bin/.idx``
pairs in the chosen --dataset-impl (mmap default, lazy/cached legacy,
raw copy). Output files are bit-compatible with the reference: data
binarized here loads in fairseq and vice versa
(tests/test_indexed_dataset.py proves both directions against the
reference's own reader/writer).

Out of scope: --alignfile/--align-suffix (the alignment-dictionary path
feeds fairseq-generate's --replace-unk NLP machinery, unused by any
speech recipe).
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys
from collections import Counter
from typing import List, Optional

logger = logging.getLogger("s2st_tpu.preprocess")


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("s2st_tpu preprocess")
    p.add_argument("--source-lang", "-s", default=None)
    p.add_argument("--target-lang", "-t", default=None)
    p.add_argument("--trainpref", default=None)
    p.add_argument("--validpref", default=None,
                   help="comma-separated valid prefixes")
    p.add_argument("--testpref", default=None,
                   help="comma-separated test prefixes")
    p.add_argument("--destdir", default="data-bin")
    p.add_argument("--thresholdsrc", type=int, default=0)
    p.add_argument("--thresholdtgt", type=int, default=0)
    p.add_argument("--nwordssrc", type=int, default=-1)
    p.add_argument("--nwordstgt", type=int, default=-1)
    p.add_argument("--padding-factor", type=int, default=8)
    p.add_argument("--srcdict", default=None)
    p.add_argument("--tgtdict", default=None)
    p.add_argument("--joined-dictionary", action="store_true")
    p.add_argument("--only-source", action="store_true")
    p.add_argument("--dict-only", action="store_true")
    p.add_argument("--align-suffix", default=None,
                   help="binarize alignments ({pref}.{suffix} files of "
                        "src-tgt index pairs) alongside the text")
    p.add_argument("--dataset-impl", default="mmap",
                   choices=["mmap", "lazy", "cached", "raw"])
    p.add_argument("--task", default="translation",
                   help="task whose dictionary class binarizes the data "
                        "(fairseq_cli/preprocess.py task dispatch): "
                        "legacy_masked_lm uses BertDictionary so corpus "
                        "ids account for <mask>/<cls>/<sep>")
    p.add_argument("--workers", type=int, default=1,
                   help="accepted for recipe compatibility; binarization "
                        "here is single-process (IO-bound at speech-recipe "
                        "text sizes)")
    return p


def _file_name(prefix: str, lang: Optional[str]) -> str:
    return prefix + (f".{lang}" if lang else "")


def _dest_prefix(args, output_prefix: str, lang: Optional[str]) -> str:
    base = os.path.join(args.destdir, output_prefix)
    if lang is not None:
        return f"{base}.{args.source_lang}-{args.target_lang}.{lang}"
    if args.only_source:
        return base
    return f"{base}.{args.source_lang}-{args.target_lang}"


def _build_dictionary(filenames, threshold: int, nwords: int,
                      padding_factor: int, dict_cls=None):
    if dict_cls is None:
        from ..data.dictionary import Dictionary
        dict_cls = Dictionary
    d = dict_cls()
    counts: Counter = Counter()
    for fname in filenames:
        with open(fname, encoding="utf-8") as f:
            for line in f:
                counts.update(line.split())
    for word, n in counts.items():
        d.add_symbol(word, n)
    d.finalize(threshold=threshold, nwords=nwords,
               padding_factor=padding_factor)
    return d


def _binarize_file(args, vocab, input_file: str, out_prefix: str) -> None:
    from ..data import indexed_dataset
    builder = indexed_dataset.make_builder(
        indexed_dataset.data_file_path(out_prefix),
        impl=args.dataset_impl, vocab_size=len(vocab))
    nseq = ntok = 0
    replaced: Counter = Counter()
    with open(input_file, encoding="utf-8") as f:
        for line in f:
            words = line.split()
            for w in words:
                if vocab.index(w) == vocab.unk() and w != vocab.unk_word:
                    replaced[w] += 1
            builder.add_item(vocab.encode_line(line, append_eos=True))
            nseq += 1
            ntok += len(words) + 1
    builder.finalize(indexed_dataset.index_file_path(out_prefix))
    pct = 100 * sum(replaced.values()) / max(1, ntok)
    logger.info("[%s] %s: %d sents, %d tokens, %.3f%% replaced by %s",
                out_prefix, input_file, nseq, ntok, pct, vocab.unk_word)


def _make_dataset(args, vocab, input_prefix: str, output_prefix: str,
                  lang: Optional[str]) -> None:
    if args.dataset_impl == "raw":
        out = os.path.join(
            args.destdir,
            _file_name(f"{output_prefix}.{args.source_lang}-"
                       f"{args.target_lang}", lang))
        shutil.copyfile(_file_name(input_prefix, lang), out)
    else:
        _binarize_file(args, vocab, _file_name(input_prefix, lang),
                       _dest_prefix(args, output_prefix, lang))


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    args = get_parser().parse_args(argv)
    os.makedirs(args.destdir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(args.destdir, "preprocess.log"))
    logger.addHandler(fh)
    try:
        return _main(args)
    finally:
        logger.removeHandler(fh)
        fh.close()


def _main(args) -> int:
    from ..data.dictionary import Dictionary

    # task-specific dictionary class (fairseq_cli/preprocess.py builds
    # dictionaries through the task): legacy_masked_lm needs the BERT
    # specials (<mask>/<cls>/<sep>) ahead of the corpus words
    if getattr(args, "task", "translation") == "legacy_masked_lm":
        from ..tasks.legacy_masked_lm import BertDictionary as Dictionary  # noqa: F811

    logger.info("%s", args)
    target = not args.only_source

    def train_path(lang):
        return _file_name(args.trainpref, lang)

    def dict_path(lang):
        return os.path.join(args.destdir, _file_name("dict", lang) + ".txt")

    if not args.srcdict and os.path.exists(dict_path(args.source_lang)):
        raise FileExistsError(dict_path(args.source_lang))
    if (target and not args.tgtdict
            and os.path.exists(dict_path(args.target_lang))):
        raise FileExistsError(dict_path(args.target_lang))

    if args.joined_dictionary:
        assert not (args.srcdict and args.tgtdict), \
            "cannot use both --srcdict and --tgtdict with --joined-dictionary"
        if args.srcdict:
            src_dict = Dictionary.load(args.srcdict)
        elif args.tgtdict:
            src_dict = Dictionary.load(args.tgtdict)
        else:
            assert args.trainpref, "--trainpref required without --srcdict"
            src_dict = _build_dictionary(
                {train_path(lang)
                 for lang in (args.source_lang, args.target_lang)},
                args.thresholdsrc, args.nwordssrc, args.padding_factor,
                dict_cls=Dictionary)
        tgt_dict = src_dict
    else:
        if args.srcdict:
            src_dict = Dictionary.load(args.srcdict)
        else:
            assert args.trainpref, "--trainpref required without --srcdict"
            src_dict = _build_dictionary(
                [train_path(args.source_lang)], args.thresholdsrc,
                args.nwordssrc, args.padding_factor, dict_cls=Dictionary)
        if target:
            if args.tgtdict:
                tgt_dict = Dictionary.load(args.tgtdict)
            else:
                assert args.trainpref, \
                    "--trainpref required without --tgtdict"
                tgt_dict = _build_dictionary(
                    [train_path(args.target_lang)], args.thresholdtgt,
                    args.nwordstgt, args.padding_factor,
                    dict_cls=Dictionary)
        else:
            tgt_dict = None

    src_dict.save(dict_path(args.source_lang))
    if target and tgt_dict is not None:
        tgt_dict.save(dict_path(args.target_lang))
    if args.dict_only:
        return 0

    def make_all(lang, vocab):
        if args.trainpref:
            _make_dataset(args, vocab, args.trainpref, "train", lang)
        for argpref, name in ((args.validpref, "valid"),
                              (args.testpref, "test")):
            if argpref:
                for k, pref in enumerate(argpref.split(",")):
                    out = f"{name}{k}" if k > 0 else name
                    _make_dataset(args, vocab, pref, out, lang)

    make_all(args.source_lang, src_dict)
    if target:
        make_all(args.target_lang, tgt_dict)
    if args.align_suffix:
        # fairseq_cli/preprocess.py make_all_alignments: binarize
        # "i-j k-l" pair lines as flat int sequences under
        # {split}.align.{src}-{tgt}
        for pref, name in ((args.trainpref, "train"),
                           (args.validpref, "valid"),
                           (args.testpref, "test")):
            if pref and os.path.exists(f"{pref}.{args.align_suffix}"):
                _binarize_alignments(
                    args, f"{pref}.{args.align_suffix}",
                    _dest_prefix(args, f"{name}.align", None))
    logger.info("Wrote preprocessed data to %s", args.destdir)
    return 0


def _binarize_alignments(args, input_file: str, out_prefix: str) -> None:
    import re

    import numpy as np

    from ..data import indexed_dataset
    builder = indexed_dataset.make_builder(
        indexed_dataset.data_file_path(out_prefix), impl=args.dataset_impl)
    nseq = 0
    with open(input_file, encoding="utf-8") as f:
        for line in f:
            pairs = re.findall(r"(\d+)-(\d+)", line)
            flat = np.asarray([int(x) for pr in pairs for x in pr],
                              np.int64)
            builder.add_item(flat)
            nseq += 1
    builder.finalize(indexed_dataset.index_file_path(out_prefix))
    logger.info("[alignments] %s: %d sents", input_file, nseq)


if __name__ == "__main__":
    sys.exit(main())
