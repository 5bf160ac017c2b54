"""Temperature-based multi-corpus resampling (reference
examples/s2s_trans/data/s2st_dataset.py:577-586 over
fairseq/data/resampling_dataset.py) and eval_lm --context-window
(fairseq_cli/eval_lm.py:244 + fairseq/data/lm_context_window_dataset.py)."""

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_corpus


def _two_corpus_root(tmp_path, alpha=None):
    """A corpus dir with train.tsv (12) and trainB.tsv (4 rows, renamed
    copy of dev) so 'train,trainB' loads two corpora of different sizes."""
    root = make_tiny_corpus(tmp_path / "c")
    dev = (root / "dev.tsv").read_text().splitlines()
    # re-id the rows so the two corpora are distinguishable
    out = [dev[0]]
    for ln in dev[1:]:
        out.append("B_" + ln)
    (root / "trainB.tsv").write_text("\n".join(out) + "\n")
    if alpha is not None:
        with open(root / "config.yaml", "a") as f:
            f.write(f"sampling_alpha: {alpha}\n")
    return root


def _load(root, splits, seed=1):
    from s2st_tpu.data.data_cfg import S2STDataConfig
    from s2st_tpu.data.dictionary import Dictionary
    from s2st_tpu.data.s2st_dataset import S2STDatasetCreator
    cfg = S2STDataConfig(root / "config.yaml")
    src_d = Dictionary.load(str(root / "src_vocab.txt"))
    tgt_d = Dictionary.load(str(root / "tgt_vocab.txt"))
    return S2STDatasetCreator.from_tsv(str(root), cfg, splits, src_d, tgt_d,
                                       is_train_split=True, seed=seed)


def test_no_alpha_concatenates(tmp_path):
    root = _two_corpus_root(tmp_path)  # alpha defaults to 1.0
    ds = _load(root, "train,trainB")
    assert len(ds) == 16  # 12 + 4, no resampling
    assert ds.can_reuse_epoch_itr_across_epochs


def test_alpha_resamples_toward_balance(tmp_path):
    root = _two_corpus_root(tmp_path, alpha=0.3)
    ds = _load(root, "train,trainB")
    assert not ds.can_reuse_epoch_itr_across_epochs
    # alpha<1 upsamples the small corpus / downsamples the big one:
    # the size ratio between corpora must shrink vs the raw 3x
    n_b = sum(1 for i in ds.ids if str(i).startswith("B_"))
    n_a = len(ds) - n_b
    assert n_b > 4 or n_a < 12
    assert n_a / max(n_b, 1) < 3.0


def test_resampling_epochs_differ_and_are_deterministic(tmp_path):
    root = _two_corpus_root(tmp_path, alpha=0.3)
    ds = _load(root, "train,trainB")
    ds.set_epoch(1)
    e1 = list(ds.ids)
    ds.set_epoch(2)
    e2 = list(ds.ids)
    assert e1 != e2              # per-epoch redraw
    ds.set_epoch(1)
    assert list(ds.ids) == e1    # deterministic in (seed, epoch)


def test_resampling_rng_matches_reference(tmp_path):
    """Index draw parity vs the reference's own ResamplingDataset under
    identical (seed, epoch, size_ratio)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from tests.ref_loader import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference not present")
    load_reference()
    from fairseq.data.resampling_dataset import ResamplingDataset

    class _L:
        def __init__(self, n):
            self.n = n
            self.sizes = np.ones(n, np.int64)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

        def set_epoch(self, e):
            pass

    for ratio, n in ((1.6, 10), (0.7, 25)):
        ref = ResamplingDataset(_L(n), size_ratio=ratio, seed=7, epoch=3,
                                replace=(ratio >= 1.0))
        ref_idx = [ref[i] for i in range(len(ref))]
        rng = np.random.RandomState([42, 7, 3])
        ours = rng.choice(n, int(np.ceil(n * ratio)),
                          replace=(ratio >= 1.0))
        assert list(ours) == ref_idx


def test_iterator_reforms_batches_per_epoch(tmp_path):
    from s2st_tpu.data.iterators import EpochBatchIterator
    root = _two_corpus_root(tmp_path, alpha=0.3)
    ds = _load(root, "train,trainB")
    it = EpochBatchIterator(ds, max_tokens=2000, seed=1, shuffle=True)
    ids_by_epoch = []
    for _ in range(2):
        ids = []
        for batch in it.next_epoch_itr():
            ids.extend(np.asarray(batch["id"]).tolist())
        ids_by_epoch.append(sorted(set(map(int, ids))))
    # the drawn multiset changes between epochs (id indices index into the
    # CURRENT epoch's sample list; composition length may also change)
    assert len(ids_by_epoch[0]) > 0 and len(ids_by_epoch[1]) > 0


def test_train_cli_multi_corpus_resampling(tmp_path):
    """End-to-end: --train-subset train,trainB with sampling_alpha trains."""
    from s2st_tpu.cli.train import main as train_main
    root = _two_corpus_root(tmp_path, alpha=0.5)
    save = tmp_path / "ckpt"
    rc = train_main([
        str(root), "--save-dir", str(save),
        "--config-yaml", "config.yaml",
        "--train-subset", "train,trainB", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2st_loss",
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8",
        "--max-tokens", "2000", "--max-epoch", "2",
        "--optimizer", "adam", "--lr", "0.001",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--n-frames-per-step", "1",
        "--bce-pos-weight", "5.0", "--seed", "1",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1", "--log-interval", "1"])
    assert rc == 0
    assert (save / "checkpoint_last.npz").is_file()


def test_resampling_ratios_pool_by_lang_pair(tmp_path):
    """ADVICE r4: the reference get_size_ratios
    (speech_to_text_dataset.py:422-452) aggregates frame counts per lang
    pair before applying alpha — two TSVs sharing a pair must get ONE
    pooled ratio, not independent per-TSV ratios."""
    root = make_tiny_corpus(tmp_path / "c")

    def lang_copy(split_src, split_dst, src_lang, tgt_lang, n_rows):
        lines = (root / split_src).read_text().splitlines()
        hdr = lines[0] + "\tsrc_lang\ttgt_lang"
        out = [hdr]
        for ln in lines[1:1 + n_rows]:
            out.append(f"{split_dst[:-4]}_{ln}\t{src_lang}\t{tgt_lang}")
        (root / split_dst).write_text("\n".join(out) + "\n")

    # A (es->en, 8 rows) + B (es->en, 3 rows) + C (fr->en, 2 rows)
    lang_copy("train.tsv", "tA.tsv", "es", "en", 8)
    lang_copy("train.tsv", "tB.tsv", "es", "en", 3)
    lang_copy("dev.tsv", "tC.tsv", "fr", "en", 2)
    alpha = 0.5
    with open(root / "config.yaml", "a") as f:
        f.write(f"sampling_alpha: {alpha}\n")

    import csv
    sz = {}
    for s in ("tA", "tB", "tC"):
        rows = list(csv.DictReader(open(root / f"{s}.tsv"), delimiter="\t"))
        sz[s] = sum(int(r["src_n_frames"]) for r in rows)
    lp = {"es": sz["tA"] + sz["tB"], "fr": sz["tC"]}
    sz_sum = sum(lp.values())
    tp = {k: (v / sz_sum) ** alpha for k, v in lp.items()}
    psum = sum(tp.values())
    expected = {k: (tp[k] / psum) * sz_sum / lp[k] for k in lp}

    ds = _load(root, "tA,tB,tC")
    got = ds._resample["ratios"]
    # A and B share the pooled es->en ratio; C gets the fr->en ratio
    assert got[0] == pytest.approx(expected["es"], rel=1e-9)
    assert got[1] == pytest.approx(expected["es"], rel=1e-9)
    assert got[2] == pytest.approx(expected["fr"], rel=1e-9)


# ---------------------------------------------------------------------------
# eval_lm --context-window
# ---------------------------------------------------------------------------

def test_context_window_semantics_vs_reference_collater():
    """Hand-checkable golden: stream blocks scored with carried context."""
    from s2st_tpu.cli.eval_lm import ContextWindow
    cw = ContextWindow(tokens_per_sample=4, context_window=2, pad=1)
    # first batch: two full blocks of the stream [5 6 7 8 | 9 10 11 12]
    src = np.array([[5, 6, 7, 8], [9, 10, 11, 12]], np.int32)
    tgt = np.array([[6, 7, 8, 9], [10, 11, 12, 13]], np.int32)
    ns, nt = cw.add_context(src, tgt)
    # row 0: no prev context yet -> [5 6 7 8 pad pad]
    np.testing.assert_array_equal(ns[0], [5, 6, 7, 8, 1, 1])
    np.testing.assert_array_equal(nt[0], [6, 7, 8, 9, 1, 1])
    # row 1: context = last 2 tokens of row 0 -> [7 8 9 10 11 12]
    np.testing.assert_array_equal(ns[1], [7, 8, 9, 10, 11, 12])
    # context positions get pad targets (not scored)
    np.testing.assert_array_equal(nt[1], [1, 1, 10, 11, 12, 13])
    # short (padded) final block keeps alignment
    src2 = np.array([[13, 14, 1, 1]], np.int32)
    tgt2 = np.array([[14, 15, 1, 1]], np.int32)
    ns2, nt2 = cw.add_context(src2, tgt2)
    np.testing.assert_array_equal(ns2[0], [11, 12, 13, 14, 1, 1, 1, 1][:6])
    np.testing.assert_array_equal(nt2[0], [1, 1, 14, 15, 1, 1])


def test_eval_lm_context_window_e2e(tmp_path, capsys):
    """Train a tiny LM, then eval with --context-window: must run, score
    the same token count, and (with real context) not be wildly worse."""
    import random
    random.seed(0)
    d = str(tmp_path)
    for split, n in (("train", 60), ("valid", 8), ("test", 8)):
        with open(f"{d}/{split}.txt", "w") as f:
            for _ in range(n):
                f.write(" ".join(
                    f"w{random.randrange(8)}"
                    for _ in range(random.randint(3, 8))) + "\n")
    from s2st_tpu.cli.preprocess import main as pp
    bin_dir = f"{d}/bin"
    assert pp(["--only-source", "--trainpref", f"{d}/train.txt",
               "--validpref", f"{d}/valid.txt", "--testpref", f"{d}/test.txt",
               "--destdir", bin_dir, "--workers", "1"]) == 0
    from s2st_tpu.cli.train import main as train_main
    assert train_main([
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny", "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "0.003",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "5",
        "--max-tokens", "512", "--max-epoch", "1",
        "--tokens-per-sample", "32", "--sample-break-mode", "none",
        "--save-dir", f"{d}/ckpt", "--seed", "1",
        "--share-decoder-input-output-embed",
        "--no-epoch-checkpoints"]) == 0
    capsys.readouterr()
    from s2st_tpu.cli.eval_lm import main as eval_main
    common = [
        bin_dir, "--task", "language_modeling",
        "--arch", "transformer_lm_gpt2_tiny",
        "--path", f"{d}/ckpt/checkpoint_last.npz", "--gen-subset", "test",
        "--max-tokens", "512", "--tokens-per-sample", "32",
        "--sample-break-mode", "none",
        "--share-decoder-input-output-embed"]
    import re

    def ppl(s):
        m = re.search(r"Perplexity: ([\d.]+)", s)
        assert m, s
        return float(m.group(1))

    assert eval_main(common) == 0
    base = ppl(capsys.readouterr().out)
    assert eval_main(common + ["--context-window", "8"]) == 0
    ctx = ppl(capsys.readouterr().out)
    assert np.isfinite(base) and np.isfinite(ctx) and ctx > 1.0
    # context can only help or be neutral for a causal LM scoring the same
    # stream; allow generous noise for the 1-epoch tiny model
    assert ctx <= base * 1.5


def test_context_window_blocks_arrive_in_stream_order():
    """ADVICE r4 (high): with equal-length LM blocks the default
    descending-length lexsort delivers blocks in REVERSE document order,
    so the stateful ContextWindow prepended trailing tokens of the
    FOLLOWING block. preserve_order (set by eval_lm when
    --context-window > 0) must restore ascending stream order, like the
    reference LMContextWindowDataset.ordered_indices -> np.arange."""
    from s2st_tpu.data.iterators import EpochBatchIterator

    class _Blocks:
        """8 equal-length 'LM blocks' that collate to their own ids."""
        sizes = np.full(8, 32)

        def __len__(self):
            return 8

        def src_frames(self, i):
            return 32

        def collate(self, items, **kw):
            return {"id": np.asarray(items)}

        def __getitem__(self, i):
            return i

    ds = _Blocks()
    it = EpochBatchIterator(ds, max_tokens=96, shuffle=False,
                            snap_shapes=False)
    default_ids = [int(i) for b in it.next_epoch_itr(shuffle=False)
                   for i in b["id"]]
    assert default_ids == list(range(8))[::-1]  # the failure mode

    ds2 = _Blocks()
    ds2.preserve_order = True
    it2 = EpochBatchIterator(ds2, max_tokens=96, shuffle=False,
                             snap_shapes=False)
    ordered_ids = [int(i) for b in it2.next_epoch_itr(shuffle=False)
                   for i in b["id"]]
    assert ordered_ids == list(range(8))  # ascending stream order


def test_truncate_source_view():
    """--truncate-source (translation.py:88-95): strip eos, truncate to
    max_source_positions-1, re-append eos."""
    from s2st_tpu.tasks.translation import _TruncateSource

    class _DS:
        def __init__(self, rows):
            self.rows = rows
            self.sizes = np.array([len(r) for r in rows])

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    rows = [np.array([4, 5, 6, 7, 8, 2], np.int32),
            np.array([4, 5, 2], np.int32)]
    t = _TruncateSource(_DS(rows), n=3, eos=2)
    np.testing.assert_array_equal(t[0], [4, 5, 6, 2])   # truncated + eos
    np.testing.assert_array_equal(t[1], [4, 5, 2])      # short: unchanged
    np.testing.assert_array_equal(t.sizes, [4, 3])


def test_use_flash_attention_flag_threads_to_config():
    """--use-flash-attention reaches S2STConfig (the kernel itself is
    TPU-only: parity+perf evidence in tools/flash_attention_parity.py and
    the ROADMAP round-4 falsification entry)."""
    from s2st_tpu.options import build_model_config, parse_training_args
    argv = ["/tmp/x", "--task", "s2s_translation",
            "--arch", "s2st_transformer", "--criterion", "s2st_loss",
            "--use-flash-attention", "--attention-dropout", "0.0"]
    args = parse_training_args(argv)
    cfg = build_model_config(args, 10, 10)
    assert cfg.use_flash_attention is True
    assert cfg.attention_dropout == 0.0
