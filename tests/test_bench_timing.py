"""Contention-robust bench timing (VERDICT r3 Weak #1: a single pipelined
window absorbed a box-contention straggler and logged an RTF 200x below
reality). robust_windows must (a) report the median, immune to one
straggler, (b) flag and retry contended captures, (c) keep the best
capture across retries."""

from s2st_tpu.benchmark.timing import robust_windows


def test_median_immune_to_single_straggler():
    times = iter([1.0, 1.0, 200.0, 1.0, 1.0])
    out = robust_windows(lambda w: next(times), n_windows=5, max_retries=0, warmup_windows=0)
    assert out["median"] == 1.0
    assert out["best"] == 1.0
    assert out["contention_detected"] is True   # spread 200 > 3
    assert out["retries"] == 0  # max_retries=0: flagged but not retried


def test_clean_capture_no_flags():
    times = iter([1.0, 1.1, 0.95, 1.05, 1.0])
    out = robust_windows(lambda w: next(times), n_windows=5, warmup_windows=0)
    assert out["contention_detected"] is False
    assert out["retries"] == 0
    assert out["median"] == 1.0
    assert out["best"] == 0.95


def test_contended_capture_retries_and_keeps_best():
    # first capture contended (spread 100x), second clean and faster median
    times = iter([1.0, 100.0, 1.0] + [0.9, 0.95, 1.0])
    out = robust_windows(lambda w: next(times), n_windows=3, max_retries=2, warmup_windows=0)
    assert out["contention_detected"] is True
    assert out["retries"] == 1
    assert out["median"] == 0.95                 # the clean capture kept
    assert out["windows"] == [0.9, 0.95, 1.0]


def test_retry_keeps_lower_median_even_if_still_contended():
    # both captures contended; the one with the lower median wins
    times = iter([5.0, 500.0, 5.0] + [2.0, 300.0, 2.0] + [4.0, 400.0, 4.0])
    out = robust_windows(lambda w: next(times), n_windows=3, max_retries=2, warmup_windows=0)
    assert out["retries"] == 2
    assert out["median"] == 2.0
    assert out["contention_detected"] is True


def test_window_indices_unique_across_retries():
    seen = []

    def run(w):
        seen.append(w)
        return 1.0 if len(seen) <= 3 else 100.0 if len(seen) == 4 else 1.0

    robust_windows(run, n_windows=3, max_retries=1, warmup_windows=0)
    assert len(seen) == len(set(seen))  # distinct fold_in keys per window


def test_warmup_window_discarded():
    # first (warmup) window is slow but must not affect the stats
    times = iter([50.0, 1.0, 1.0, 1.0])
    out = robust_windows(lambda w: next(times), n_windows=3,
                         warmup_windows=1)
    assert out["median"] == 1.0
    assert out["contention_detected"] is False
