"""Native C++ host ops: build, BLEU counting, edit distance, and batcher
equivalence with the Python implementation (libbleu / libnat /
data_utils_fast parity)."""

import numpy as np
import pytest

from s2st_tpu import clib


@pytest.fixture(scope="module")
def lib():
    lib = clib.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_bleu_matches_python(lib):
    from s2st_tpu.scoring import bleu_from_counts, corpus_bleu_counts
    r = np.random.RandomState(0)
    refs = [list(r.randint(0, 20, size=r.randint(5, 30))) for _ in range(8)]
    hyps = [list(r.randint(0, 20, size=r.randint(5, 30))) for _ in range(8)]
    nb = clib.NativeBleu()
    for ref, hyp in zip(refs, hyps):
        nb.add(ref, hyp)
    m, t, rl, hl = corpus_bleu_counts(
        [list(map(int, x)) for x in refs], [list(map(int, x)) for x in hyps])
    np.testing.assert_array_equal(nb.match, m)
    np.testing.assert_array_equal(nb.total, t)
    assert int(nb.ref_len[0]) == rl and int(nb.hyp_len[0]) == hl
    assert abs(nb.score() - bleu_from_counts(m, t, rl, hl)) < 1e-9


def test_native_edit_distance(lib):
    assert clib.edit_distance_tokens([1, 2, 3], [1, 2, 3]) == 0
    assert clib.edit_distance_tokens([1, 2, 3, 4], [1, 9, 3]) == 2
    assert clib.edit_distance_tokens([], [1, 2]) == 2


def test_scoring_uses_native(lib):
    from s2st_tpu.scoring import edit_distance
    assert edit_distance("kitten", "sitting") == 3


def test_native_batcher_matches_python(lib):
    from s2st_tpu.data import iterators as it
    r = np.random.RandomState(1)
    lengths = r.randint(5, 200, size=300)
    indices = np.argsort(-lengths, kind="stable")
    for max_tokens, max_sent, mult in [(400, None, 1), (1000, 16, 8),
                                       (250, 4, 2)]:
        native = clib.batch_by_size_native(indices, lengths.astype(np.int64),
                                           max_tokens, max_sent or 0, mult)
        # force the python path by calling the inner loop directly
        py = []
        cur, cur_max = [], 0
        for idx in indices:
            ln = int(lengths[idx])
            if ln > max_tokens:
                continue
            new_max = max(cur_max, ln)
            if cur and ((len(cur) + 1) * new_max > max_tokens
                        or (max_sent and len(cur) >= max_sent)):
                bs = max(len(cur) // mult * mult, 1) if len(cur) >= mult \
                    else len(cur)
                py.append(np.asarray(cur[:bs]))
                cur = cur[bs:]
                cur_max = max((int(lengths[i]) for i in cur), default=0)
                new_max = max(cur_max, ln)
            cur.append(int(idx))
            cur_max = new_max
        if cur:
            py.append(np.asarray(cur))
        assert len(native) == len(py), (max_tokens, len(native), len(py))
        for a, b in zip(native, py):
            np.testing.assert_array_equal(a, b)
