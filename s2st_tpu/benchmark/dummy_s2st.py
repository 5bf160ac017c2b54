"""Synthetic benchmark task (parity: fairseq/benchmark/dummy_*.py —
perf runs without real data, dummy_mt.py:17-119 pattern).

``--task dummy_s2st`` serves random fbank/mel batches with the exact key
layout of the real S2ST collater, so the full train step can be profiled
with `python -m s2st_tpu.cli.train dummy ...` and no corpus on disk."""

from __future__ import annotations

import numpy as np

from ..registry import register_task
from ..tasks.s2s_translation import S2STranslationTask


class _DummyDict:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def string(self, t):
        return " ".join(str(int(x)) for x in t)


class DummyS2STDataset:
    def __init__(self, n_items: int, feat_dim: int, out_dim: int,
                 src_t: int, tgt_t: int, vocab: int, n_txt: int, seed: int,
                 n_frames_per_step: int = 1):
        self.n = n_items
        self.feat_dim = feat_dim
        self.out_dim = out_dim * n_frames_per_step
        self.src_t = src_t
        self.tgt_t = tgt_t // n_frames_per_step
        self.vocab = vocab
        self.n_txt = n_txt
        self.seed = seed

    def __len__(self):
        return self.n

    def src_frames(self, i):
        return self.src_t

    def num_frames(self, i):
        return self.tgt_t

    def __getitem__(self, i):
        from ..data.s2st_dataset import S2STItem
        r = np.random.RandomState(self.seed + i)
        text = r.randint(4, self.vocab, size=self.n_txt).astype(np.int32)
        text[-1] = 2
        return S2STItem(
            index=i,
            src_speech=r.randn(self.src_t, self.feat_dim).astype(np.float32),
            tgt_speech=r.randn(self.tgt_t, self.out_dim).astype(np.float32),
            src_text=text, tgt_text=text.copy(), src_orig=None,
            speaker_id=None, tgt_text_orig="")

    def collate_meta(self, indices):
        n = len(list(indices))
        return (self.src_t, self.tgt_t, self.n_txt, self.n_txt,
                n * self.n_txt, n * self.n_txt)

    def collate(self, items, **kw):
        from ..data.s2st_dataset import S2STDataset
        ds = S2STDataset.__new__(S2STDataset)
        ds.speaker_to_id = None
        ds.tgt_dict = _DummyDict(self.vocab)
        return S2STDataset.collate(ds, items, **kw)


@register_task("dummy_s2st")
class DummyS2STTask(S2STranslationTask):
    @classmethod
    def setup_task(cls, args):
        src_dict = _DummyDict(getattr(args, "dummy_vocab", 100))
        tgt_dict = _DummyDict(getattr(args, "dummy_vocab", 100))
        task = cls.__new__(cls)
        task.args = args
        task.data_cfg = _DummyDataCfg(args)
        task.src_dict = src_dict
        task.tgt_dict = tgt_dict
        task.datasets = {}
        task.speaker_to_id = None
        return task

    def load_dataset(self, split: str):
        a = self.args
        ds = DummyS2STDataset(
            n_items=getattr(a, "dummy_items", 256),
            feat_dim=getattr(a, "input_feat_per_channel", 80),
            out_dim=a.output_frame_dim,
            src_t=getattr(a, "dummy_src_frames", 1200),
            tgt_t=getattr(a, "dummy_tgt_frames", 960),
            vocab=len(self.src_dict), n_txt=32, seed=a.seed,
            n_frames_per_step=a.n_frames_per_step)
        self.datasets[split] = ds
        return ds

    def gcmvn_stats(self):
        return None, None


class _DummyDataCfg:
    def __init__(self, args):
        self.input_feat_per_channel = getattr(args, "input_feat_per_channel",
                                              80)
        self.features = {"sample_rate": 16000, "n_fft": 1024,
                         "hop_length": 256, "win_length": 1024,
                         "n_mels": args.output_frame_dim,
                         "f_min": 20.0, "f_max": 8000.0,
                         "win_len_t": 1024 / 16000, "hop_len_t": 256 / 16000}
        self.tgt_global_cmvn_stats_npz = None

    def set_use_hubert(self, v):
        pass
