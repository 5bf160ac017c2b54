"""Multi-host data path tests.

Reference analogue: fairseq shards data per rank (ShardedIterator,
fairseq/data/iterators.py:446-459) and gates checkpoint IO on rank 0
(trainer.py:205-230). Here: every process collates a row slice of the same
global batch to identical padded shapes, `put_batch` assembles one global
jax.Array via make_array_from_process_local_data, and training over N
processes must produce the same parameters as one process.

Two tiers: (1) in-process unit tests of the row-sharded collate
(disjointness + shape agreement + global-normalizer invariance), and
(2) a real 2-process CPU run (jax.distributed + gloo collectives) compared
against a single-process run — the TPU-native analogue of the reference's
file-rendezvous spawn tests (tests/distributed/utils.py:12-37).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.make_tiny_corpus import make_tiny_corpus

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_tiny_corpus(tmp_path_factory.mktemp("tiny_corpus_mh"))


def _make_dataset(corpus):
    from s2st_tpu.data.data_cfg import S2STDataConfig
    from s2st_tpu.data.dictionary import Dictionary
    from s2st_tpu.data.s2st_dataset import S2STDataset, _load_tsv
    cfg = S2STDataConfig(Path(corpus) / "config.yaml")
    src_dict = Dictionary.load(str(Path(corpus) / "src_vocab.txt"))
    tgt_dict = Dictionary.load(str(Path(corpus) / "tgt_vocab.txt"))
    samples = _load_tsv(Path(corpus) / "train.tsv")
    for s in samples:
        for k in ("src_audio", "tgt_audio"):
            s[k] = str(Path(corpus) / s[k])
    return S2STDataset("train", True, cfg, samples, src_dict, tgt_dict)


def test_row_sharded_collate_disjoint_and_aligned(corpus):
    """Rank slices are disjoint, cover the batch, and collate to identical
    padded shapes with GLOBAL text-token normalizers."""
    from s2st_tpu.data.iterators import EpochBatchIterator
    ds = _make_dataset(corpus)
    single = EpochBatchIterator(ds, max_tokens=10000, max_sentences=None,
                                seed=3, shuffle=False)
    ref_batches = list(single.next_epoch_itr(shuffle=False))
    assert len(ref_batches) >= 1

    world = 2
    shards = []
    for rank in range(world):
        it = EpochBatchIterator(ds, max_tokens=10000, max_sentences=None,
                                seed=3, shuffle=False,
                                data_rank=rank, data_world=world)
        shards.append(list(it.next_epoch_itr(shuffle=False)))
    assert len(shards[0]) == len(shards[1]) == len(ref_batches)

    for bi, ref in enumerate(ref_batches):
        b0, b1 = shards[0][bi], shards[1][bi]
        # identical padded shapes across ranks (same compiled program)
        for k in ("src_speech", "tgt_speech", "src_text", "tgt_text"):
            assert b0[k].shape == b1[k].shape, k
        # disjoint, covering row assignment
        ids0 = set(int(i) for i in b0["id"] if i >= 0)
        ids1 = set(int(i) for i in b1["id"] if i >= 0)
        ref_ids = set(int(i) for i in ref["id"] if i >= 0)
        assert ids0.isdisjoint(ids1)
        assert ids0 | ids1 == ref_ids
        # CE normalizers are global (equal on every rank, = the
        # single-process batch's count)
        assert b0["src_txt_ntokens"] == b1["src_txt_ntokens"] \
            == ref["src_txt_ntokens"]
        assert b0["tgt_txt_ntokens"] == b1["tgt_txt_ntokens"] \
            == ref["tgt_txt_ntokens"]
        # loss-relevant content identical: global sums of masked features
        def msum(b, k, lens_k):
            tot = 0.0
            for row in range(b[k].shape[0]):
                ln = int(b[lens_k][row])
                tot += float(np.abs(b[k][row, :ln]).sum())
            return tot
        for k, lk in (("src_speech", "src_speech_lens"),
                      ("tgt_speech", "target_lengths")):
            np.testing.assert_allclose(
                msum(b0, k, lk) + msum(b1, k, lk), msum(ref, k, lk),
                rtol=1e-5)


_WORKER = r"""
import os, sys
nproc, pid, corpus, save_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
if nproc > 1:
    os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:" + sys.argv[5]
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
from s2st_tpu.cli.train import main
args = [corpus, "--save-dir", save_dir, "--config-yaml", "config.yaml",
        "--train-subset", "train", "--valid-subset", "dev",
        "--task", "s2s_translation", "--criterion", "s2st_loss",
        "--arch", "s2st_transformer",
        "--encoder-layers", "1", "--encoder-embed-dim", "16",
        "--encoder-ffn-embed-dim", "32", "--encoder-attention-heads", "2",
        "--decoder-layers", "1", "--decoder-embed-dim", "16",
        "--decoder-ffn-embed-dim", "32", "--decoder-attention-heads", "2",
        "--conv-channels", "16", "--middle-layers", "0",
        "--prenet-dim", "8", "--prenet-layers", "1",
        "--postnet-layers", "1", "--postnet-conv-dim", "8",
        "--output-frame-dim", "8", "--dropout", "0.0",
        "--prenet-dropout", "0.0", "--attention-dropout", "0.0",
        "--activation-dropout", "0.0", "--postnet-dropout", "0.0",
        "--max-tokens", "2000", "--batch-size", "4",
        "--optimizer", "sgd", "--lr", "0.05",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "4",
        "--clip-norm", "1.0", "--seed", "1", "--max-epoch", "1",
        "--max-source-positions", "128", "--max-target-positions", "128",
        "--required-batch-size-multiple", "1", "--log-interval", "1",
        "--disable-validation"]
if nproc > 1:
    args.append("--multihost")
sys.exit(main(args))
"""


def test_two_process_cpu_matches_single_process(corpus, tmp_path):
    """2-process --multihost training (real jax.distributed + gloo) lands on
    the same parameters as single-process DP over the same global batches."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    dir_single = tmp_path / "single"
    rc = subprocess.run(
        [sys.executable, str(worker), "1", "0", str(corpus),
         str(dir_single)], env=env, cwd=str(REPO), timeout=600).returncode
    assert rc == 0

    dir_multi = tmp_path / "multi"
    port = "49741"
    p1 = subprocess.Popen(
        [sys.executable, str(worker), "2", "1", str(corpus), str(dir_multi),
         port], env=env, cwd=str(REPO))
    rc0 = subprocess.run(
        [sys.executable, str(worker), "2", "0", str(corpus), str(dir_multi),
         port], env=env, cwd=str(REPO), timeout=600).returncode
    rc1 = p1.wait(timeout=120)
    assert rc0 == 0 and rc1 == 0

    def params(p):
        with np.load(str(p)) as z:
            return {k: z[k].copy() for k in z.files
                    if k.startswith("params::")}
    pa = params(dir_single / "checkpoint_last.npz")
    pb = params(dir_multi / "checkpoint_last.npz")
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
