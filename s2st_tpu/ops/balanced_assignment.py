"""Balanced linear assignment (auction algorithm) for the BASE MoE layer.

Parity: ``fairseq/clib/libbase/balanced_assignment.cpp`` — Bertsekas
auction adapted to k = num_jobs/num_workers jobs per worker: each worker
bids (top_k value - top_{k+1} value + eps) on its k best jobs, winners
raise job prices, last round's winners keep a minimal retaining bid, and
after 100 iterations the bid values collapse to the raw scores for a
fast approximate finish. Returns the per-worker job blocks flattened
(W * k job indices), exactly the C++ op's output.

Host op (numpy): the reference runs this on CPU per batch too; inside a
jitted program it is reachable via ``jax.pure_callback``.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def balanced_assignment(job_worker_scores: np.ndarray,
                        hard_cap: int = 400) -> np.ndarray:
    """job_worker_scores: (num_jobs, num_workers) float. num_jobs must be
    a multiple of num_workers. Returns (num_jobs,) int64."""
    scores = np.asarray(job_worker_scores, np.float32)
    if not np.isfinite(scores).all():
        ok = np.isfinite(scores)
        scores = scores.copy()
        scores[~ok] = scores[ok].min()
    eps = max(float(scores.max() - scores.min()) / 50.0, 1e-4)
    wj = scores.T.copy()                       # (W, J) worker-major
    num_workers, num_jobs = wj.shape
    assert num_jobs % num_workers == 0
    jpw = num_jobs // num_workers
    value = wj.copy()
    max_value = wj.max()
    cost = np.zeros(num_jobs, np.float32)
    jobs_idx = np.arange(num_jobs)
    bid_indices = None
    counter = 0
    max_iterations = 100
    while True:
        # top (k+1) values per worker
        part = np.argpartition(-value, jpw, axis=1)[:, :jpw + 1]
        part_vals = np.take_along_axis(value, part, axis=1)
        order = np.argsort(-part_vals, axis=1)
        top_index = np.take_along_axis(part, order, axis=1)
        top_values = np.take_along_axis(part_vals, order, axis=1)

        bids = np.zeros((num_workers, num_jobs), np.float32)
        bid_incr = top_values[:, :jpw] - top_values[:, jpw:jpw + 1] + eps
        np.put_along_axis(bids, top_index[:, :jpw], bid_incr, axis=1)
        if 0 < counter and bid_indices is not None:
            # retaining bids for last round's winners (overwrites, like
            # the reference's index_put_)
            bids.reshape(-1)[bid_indices] = eps

        high_bidders = np.argmax(bids, axis=0)
        high_bids = bids[high_bidders, jobs_idx]
        have_bids = high_bids > 0
        if have_bids.all():
            return top_index[:, :jpw].reshape(-1).astype(np.int64)

        cost += high_bids
        value = wj - cost
        bid_indices = (high_bidders * num_jobs + jobs_idx)[have_bids]
        if counter < max_iterations:
            value.reshape(-1)[bid_indices] = max_value
        else:
            value.reshape(-1)[bid_indices] = \
                wj.reshape(-1)[bid_indices]
        counter += 1
        if counter > hard_cap:
            logger.warning("balanced_assignment hit the hard cap; "
                           "returning the current best")
            return top_index[:, :jpw].reshape(-1).astype(np.int64)


def greedy_assignment(scores: np.ndarray, k: int = 1):
    """Inference-time routing (base_layer.py:76-87): each token to its
    top-k experts; returns (sort_by_expert order, tokens-per-expert
    counts)."""
    token_to_workers = np.argsort(-scores, axis=1)[:, :k].reshape(-1)
    sort_ordering = np.argsort(token_to_workers, kind="stable")
    worker2token = sort_ordering // k
    counts = np.bincount(token_to_workers, minlength=scores.shape[1])
    return worker2token.astype(np.int64), counts.astype(np.int64)
