"""Data layer: dictionary, collate semantics, batching, iterator resume.

Parity targets: fairseq/data/dictionary.py, examples/s2s_trans/data/
s2st_dataset.py collater (:333-455), fairseq/data/iterators.py."""

import numpy as np
import pytest

from s2st_tpu.data.dictionary import Dictionary
from s2st_tpu.data.iterators import (EpochBatchIterator, GroupedIterator,
                                     batch_by_size, ordered_indices, snap_len)
from s2st_tpu.data.s2st_dataset import S2STItem, pack_frames


def test_dictionary_roundtrip(tmp_path):
    d = Dictionary()
    for w in ["hola", "mundo", "adios"]:
        d.add_symbol(w, n=3)
    assert d.bos_index == 0 and d.pad_index == 1
    assert d.eos_index == 2 and d.unk_index == 3
    ids = d.encode_line("hola mundo", append_eos=True)
    assert ids[-1] == d.eos()
    assert d.string(ids[:-1]) == "hola mundo"
    # unknown words map to unk
    ids2 = d.encode_line("zzz", append_eos=False)
    assert ids2[0] == d.unk()
    p = tmp_path / "dict.txt"
    d.save(str(p))
    d2 = Dictionary.load(str(p))
    assert len(d2) == len(d)
    assert d2.index("mundo") == d.index("mundo")


def test_pack_frames():
    x = np.arange(28, dtype=np.float32).reshape(7, 4)
    p = pack_frames(x, 1)
    np.testing.assert_array_equal(p, x)
    p3 = pack_frames(x, 3)
    assert p3.shape == (2, 12)  # floor(7/3)=2 packed steps
    np.testing.assert_array_equal(p3[0], x[:3].reshape(-1))


class _FakeDataset:
    """Minimal dataset for iterator tests."""

    def __init__(self, n=23, feat=4, seed=0):
        r = np.random.RandomState(seed)
        self.lens = r.randint(5, 40, size=n)
        self.feat = feat

    def __len__(self):
        return len(self.lens)

    def src_frames(self, i):
        return int(self.lens[i])

    def __getitem__(self, i):
        t = int(self.lens[i])
        return S2STItem(index=i,
                        src_speech=np.zeros((t, self.feat), np.float32),
                        tgt_speech=np.zeros((t, self.feat), np.float32),
                        src_text=np.array([4, 2], np.int32),
                        tgt_text=np.array([5, 2], np.int32),
                        src_orig=None, speaker_id=None, tgt_text_orig="")

    def collate(self, items, **kw):
        return {"id": np.asarray([it.index for it in items]),
                "pad_kw": kw}


def test_ordered_indices_descending():
    lens = np.array([3, 10, 1, 7])
    order = ordered_indices(lens, shuffle=False, seed=1, epoch=1)
    np.testing.assert_array_equal(lens[order], [10, 7, 3, 1])


def test_batch_by_size_budget():
    lens = np.array([10, 10, 10, 10, 10])
    idx = np.arange(5)
    batches = batch_by_size(idx, lens, max_tokens=30)
    assert all(len(b) * 10 <= 30 for b in batches)
    assert sum(len(b) for b in batches) == 5


def test_snap_len_shape_menu():
    # snapped sizes form a small menu: <=4 per octave
    sizes = {snap_len(n) for n in range(1, 2048)}
    assert len(sizes) < 40
    assert all(snap_len(n) >= n for n in range(1, 2048))


def test_iterator_sharding_and_determinism():
    ds = _FakeDataset()
    full = EpochBatchIterator(ds, max_tokens=100, seed=7, shuffle=True)
    n_total = len(full)
    seen = []
    shards = [EpochBatchIterator(ds, max_tokens=100, seed=7, shuffle=True,
                                 num_shards=2, shard_id=s) for s in (0, 1)]
    assert len(shards[0]) == len(shards[1])  # equal batch counts per shard
    for s in shards:
        for b in s.next_epoch_itr():
            seen.extend(b["id"].tolist())
    # every sample appears at least once across shards (padding may dup)
    assert set(seen) >= set(range(len(ds)))


def test_iterator_mid_epoch_resume():
    ds = _FakeDataset()
    it1 = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=True)
    g = it1.next_epoch_itr()
    first_two = [next(g)["id"].tolist() for _ in range(2)]
    state = it1.state_dict()
    assert state["iterations_in_epoch"] == 2

    it2 = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=True)
    it2.load_state_dict(state)
    rest2 = [b["id"].tolist() for b in it2.next_epoch_itr()]
    rest1 = [b["id"].tolist() for b in g]
    assert rest1 == rest2  # resume sees exactly the remaining batches


def test_iterator_epoch_reshuffles():
    ds = _FakeDataset()
    it = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=True)
    e1 = [b["id"].tolist() for b in it.next_epoch_itr()]
    e2 = [b["id"].tolist() for b in it.next_epoch_itr()]
    assert it.epoch == 3
    assert e1 != e2  # batch order reshuffled between epochs


def test_grouped_iterator():
    chunks = list(GroupedIterator(iter(range(7)), 3))
    assert chunks == [[0, 1, 2], [3, 4, 5], [6]]
    chunks = list(GroupedIterator(iter(range(7)), 3, skip_remainder_batch=True))
    assert chunks == [[0, 1, 2], [3, 4, 5]]


def test_collate_static_shape_padding(tiny_cfg):
    """collate pads to requested static shapes with fully-masked rows."""
    from s2st_tpu.data.s2st_dataset import S2STDataset
    items = []
    r = np.random.RandomState(0)
    for i, (ts, tt) in enumerate([(12, 9), (8, 5)]):
        items.append(S2STItem(
            index=i,
            src_speech=r.randn(ts, 8).astype(np.float32),
            tgt_speech=r.randn(tt, 8).astype(np.float32),
            src_text=np.array([4, 5, 2], np.int32),
            tgt_text=np.array([6, 2], np.int32),
            src_orig=None, speaker_id=None, tgt_text_orig="x"))
    ds = S2STDataset.__new__(S2STDataset)
    ds.speaker_to_id = None

    class _D:
        def string(self, t):
            return " ".join(map(str, t))
    ds.tgt_dict = _D()
    batch = ds.collate(items, pad_batch=4, pad_src_t=16, pad_tgt_t=12,
                       pad_src_txt=8, pad_tgt_txt=8)
    assert batch["src_speech"].shape == (4, 16, 8)
    assert batch["tgt_speech"].shape == (4, 12, 8)
    assert batch["src_text"].shape == (4, 8)
    np.testing.assert_array_equal(batch["src_speech_lens"][2:], [0, 0])
    np.testing.assert_array_equal(batch["target_lengths"][2:], [0, 0])
    # shifted target: zero BOS frame then target[:-1]
    np.testing.assert_array_equal(batch["prev_output_tokens"][:, 0], 0.0)
    np.testing.assert_allclose(batch["prev_output_tokens"][0, 1:9],
                               batch["tgt_speech"][0, :8])
    # prev text tokens: eos moved to front
    assert batch["prev_src_text_tokens"][0, 0] == 2
    np.testing.assert_array_equal(batch["prev_src_text_tokens"][0, 1:3],
                                  batch["src_text"][0, :2])


def test_buffered_iterator():
    from s2st_tpu.data.iterators import BufferedIterator
    items = list(BufferedIterator(iter(range(20)), buffer_size=3))
    assert items == list(range(20))

    def boom():
        yield 1
        raise ValueError("boom")
    it = BufferedIterator(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        next(it)


def test_utterance_cmvn_and_specaugment():
    from s2st_tpu.data.feature_transforms import SpecAugment, UtteranceCMVN
    r = np.random.RandomState(0)
    x = (r.randn(40, 8) * 3 + 5).astype(np.float32)
    out = UtteranceCMVN(norm_means=True, norm_vars=True)(x)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-4)

    sa = SpecAugment(time_warp_w=0, freq_mask_n=2, freq_mask_f=3,
                     time_mask_n=2, time_mask_t=5, time_mask_p=1.0,
                     rng=np.random.RandomState(7))
    masked = sa(x.copy())
    assert masked.shape == x.shape
    # masked cells take the spectrogram mean (specaugment.py parity)
    n_masked = int((masked != x).sum())
    assert 0 < n_masked < masked.size
    changed = masked[masked != x]
    np.testing.assert_allclose(changed, x.mean(), atol=1e-5)


def test_max_positions_filtering():
    """--skip-invalid-size-inputs: samples longer than max_positions are
    dropped at batch-formation time (fairseq_task.py:168-199 parity)."""
    ds = _FakeDataset(n=30, seed=2)
    it = EpochBatchIterator(ds, max_tokens=500, seed=1, shuffle=False,
                            max_positions=20)
    seen = []
    for b in it.next_epoch_itr(shuffle=False):
        seen.extend(b["id"].tolist())
    assert all(ds.src_frames(i) <= 20 for i in seen)
    n_valid = sum(1 for i in range(len(ds)) if ds.src_frames(i) <= 20)
    assert len(set(seen)) == n_valid


def test_num_workers_same_batches_and_resume():
    """--num-workers > 1: identical batch sequence to the synchronous path
    and exact consumed-position accounting for mid-epoch resume (DataLoader
    workers parity, fairseq/data/iterators.py:230-390)."""
    ds = _FakeDataset()

    def run(num_workers, offset=0):
        it = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=True,
                                num_workers=num_workers)
        out = []
        for b in it.next_epoch_itr(shuffle=True, offset=offset):
            out.append(np.asarray(b["id"]))
        return out

    seq0 = run(0)
    seq4 = run(4)
    assert len(seq0) == len(seq4)
    for a, b in zip(seq0, seq4):
        np.testing.assert_array_equal(a, b)

    # mid-epoch consumed accounting with workers: stop after 1 batch,
    # resume from the recorded position, sequences concatenate exactly
    it = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=True,
                            num_workers=4)
    gen = it.next_epoch_itr(shuffle=True)
    first = np.asarray(next(gen)["id"])
    consumed = it.iterations_in_epoch
    assert consumed == 1
    rest = run(4, offset=consumed)
    np.testing.assert_array_equal(first, seq0[0])
    assert len(rest) == len(seq0) - 1
    for a, b in zip(rest, seq0[1:]):
        np.testing.assert_array_equal(a, b)


def test_num_batch_buckets_quantile_menu():
    """--num-batch-buckets: bucket math matches the reference
    (fairseq/data/data_utils.py:545-564 get_buckets/get_bucketed_sizes)
    and the iterator's padded src-time dims come from the bucket menu."""
    from s2st_tpu.data.iterators import get_buckets
    sizes = np.array([5, 7, 9, 12, 18, 25, 31, 39, 40, 40])
    buckets = get_buckets(sizes, 3)
    # reference math, hand-checked: percentiles [0,33.3,66.6,100] 'lower'
    ref = np.unique(np.percentile(sizes, np.linspace(0, 100, 4),
                                  method="lower")[1:])
    np.testing.assert_array_equal(buckets, ref)

    ds = _FakeDataset()
    it = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=False,
                            num_batch_buckets=4)
    pad_ts = set()
    for b in it.next_epoch_itr(shuffle=False):
        pad_ts.add(b["pad_kw"]["pad_src_t"])
    assert it._buckets is not None and len(it._buckets) <= 4
    assert pad_ts <= set(int(x) for x in it._buckets)
    # every sample fits its bucket
    assert max(ds.lens) <= max(pad_ts)

    # default grid still used when the flag is off
    it0 = EpochBatchIterator(ds, max_tokens=100, seed=3, shuffle=False)
    for b in it0.next_epoch_itr(shuffle=False):
        assert b["pad_kw"]["pad_src_t"] % 16 == 0
