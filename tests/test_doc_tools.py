"""Document utility scripts (scripts/{count,shard,split}_docs + rm_pt)."""

import os
import random

import numpy as np


def _write_docs(path, docs):
    with open(path, "w") as f:
        for i, d in enumerate(docs):
            if i:
                f.write("\n")
            for line in d:
                f.write(line + "\n")


def test_shard_docs_round_robin(tmp_path):
    from s2st_tpu.preprocessing.doc_tools import shard_docs
    docs = [[f"d{i}l{j}" for j in range(2)] for i in range(7)]
    path = str(tmp_path / "corpus.txt")
    _write_docs(path, docs)
    assert shard_docs([path, "--num-shards", "3"]) == 0
    got = []
    for s in range(3):
        text = open(f"{path}.shard{s}").read().strip()
        got.append([blk.splitlines() for blk in text.split("\n\n")])
    # round-robin doc assignment
    assert got[0][0][0] == "d0l0" and got[1][0][0] == "d1l0"
    assert sum(len(g) for g in got) == 7


def test_split_train_valid_docs(tmp_path):
    from s2st_tpu.preprocessing.doc_tools import split_train_valid_docs
    random.seed(0)
    docs = [[f"d{i}"] for i in range(10)]
    path = str(tmp_path / "corpus.txt")
    _write_docs(path, docs)
    assert split_train_valid_docs(
        [path, str(tmp_path / "sample"), str(tmp_path / "rest"),
         "-k", "3"]) == 0
    sample = open(tmp_path / "sample").read().strip().split("\n\n")
    rest = open(tmp_path / "rest").read().strip().split("\n\n")
    assert len(sample) == 3 and len(rest) == 7
    all_lines = sorted(x for blk in sample + rest for x in blk.splitlines())
    assert all_lines == sorted(f"d{i}" for i in range(10))


def test_count_docs(tmp_path, capsys):
    from s2st_tpu.preprocessing.doc_tools import count_docs
    path = str(tmp_path / "corpus.txt")
    _write_docs(path, [["a b c", "d e"], ["f"]])
    assert count_docs([path]) == 0
    out = capsys.readouterr().out
    assert "found 2 docs" in out


def test_rm_pt(tmp_path):
    from s2st_tpu.preprocessing.doc_tools import rm_pt
    d = tmp_path / "run"
    d.mkdir()
    for name in ("checkpoint1.npz", "checkpoint2.npz", "checkpoint3.npz",
                 "checkpoint_3_600.npz", "checkpoint_best.npz",
                 "checkpoint_last.npz"):
        (d / name).write_bytes(b"x")
    assert rm_pt([str(tmp_path), "--save-last", "1"]) == 0
    left = sorted(os.listdir(d))
    # newest numbered checkpoint kept (update-based 600 > epochs), plus
    # best/last preserved
    assert "checkpoint_best.npz" in left and "checkpoint_last.npz" in left
    assert "checkpoint_3_600.npz" in left
    assert "checkpoint1.npz" not in left
