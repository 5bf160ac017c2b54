"""Batching + resumable epoch iteration with XLA-friendly static shapes.

Parity: ``fairseq/data/iterators.py`` (EpochBatchIterator semantics: frozen
batches, seeded per-epoch batch shuffling, every-Nth-batch sharding,
``state_dict``/``load_state_dict`` mid-epoch resume) and
``fairseq/data/data_utils.py:281`` + ``data_utils_fast.pyx`` (token-budget
batch formation over length-ordered indices).

TPU-native twist: every batch's tensor dims are snapped UP to a coarse
geometric grid (``snap_len``) so the closed set of compiled XLA programs
stays small (SURVEY.md §7 "fixed padded bucket shapes"); padded rows/frames
carry zero lengths and are exactly masked out downstream.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def snap_len(n: int, min_step: int = 16) -> int:
    """Round n up to a coarse grid: multiples of 2^(bitlen-3), at least
    min_step. Guarantees <= 4 distinct sizes per octave -> O(log T) shapes."""
    n = max(int(n), 1)
    step = max(min_step, 1 << max(n.bit_length() - 3, 0))
    return -(-n // step) * step


def get_buckets(sizes: np.ndarray, num_buckets: int) -> np.ndarray:
    """N length-quantile bucket boundaries (reference
    fairseq/data/data_utils.py:545-553 get_buckets: unique percentiles at
    linspace(0,100,N+1)[1:], 'lower' interpolation)."""
    return np.unique(np.percentile(
        sizes, np.linspace(0, 100, num_buckets + 1),
        method="lower")[1:])


def ordered_indices(lengths: np.ndarray, shuffle: bool, seed: int,
                    epoch: int) -> np.ndarray:
    """Length-major ordering with seeded shuffle tiebreak
    (speech_to_text_dataset.py:357-364 parity)."""
    if shuffle:
        rng = np.random.RandomState(seed + epoch)
        tie = rng.permutation(len(lengths))
    else:
        tie = np.arange(len(lengths))
    return np.lexsort((tie, lengths))[::-1]  # descending length


def batch_by_size(indices: np.ndarray, lengths: np.ndarray, max_tokens: int,
                  max_sentences: Optional[int] = None,
                  required_batch_size_multiple: int = 1) -> List[np.ndarray]:
    """Token-budget batching (data_utils_fast.pyx batch_by_size_vec parity):
    cost of a batch = max length in batch * batch size. Uses the native C++
    batcher (s2st_tpu/clib) when available."""
    try:
        from ..clib import batch_by_size_native
        native = batch_by_size_native(indices, lengths, max_tokens,
                                      max_sentences or 0,
                                      required_batch_size_multiple)
        if native is not None:
            return native
    except Exception as e:
        logger.debug(f"native batcher unavailable: {e}")
    batches: List[np.ndarray] = []
    cur: List[int] = []
    cur_max = 0
    for idx in indices:
        ln = int(lengths[idx])
        if ln > max_tokens:
            logger.warning(f"skipping sample {idx}: length {ln} > max_tokens")
            continue
        new_max = max(cur_max, ln)
        if cur and ((len(cur) + 1) * new_max > max_tokens
                    or (max_sentences and len(cur) >= max_sentences)):
            mult = required_batch_size_multiple
            bs = max(len(cur) // mult * mult, 1) if len(cur) >= mult else len(cur)
            batches.append(np.asarray(cur[:bs]))
            cur = cur[bs:]
            cur_max = max((int(lengths[i]) for i in cur), default=0)
            new_max = max(cur_max, ln)
        cur.append(int(idx))
        cur_max = new_max
    if cur:
        batches.append(np.asarray(cur))
    return batches


class EpochBatchIterator:
    """Deterministic, shardable, mid-epoch-resumable batch iterator.

    collate_fn(items, pad_batch, pad_src_t, pad_tgt_t, pad_src_txt,
    pad_tgt_txt) -> batch dict.
    """

    def __init__(self, dataset, max_tokens: int,
                 max_sentences: Optional[int] = None, seed: int = 1,
                 num_shards: int = 1, shard_id: int = 0,
                 shuffle: bool = True, snap_shapes: bool = True,
                 required_batch_size_multiple: int = 1,
                 skip_remainder_batch: bool = False,
                 max_positions: Optional[int] = None,
                 data_rank: int = 0, data_world: int = 1,
                 num_workers: int = 0, num_batch_buckets: int = 0):
        """max_positions: drop samples whose source length exceeds it
        (--skip-invalid-size-inputs-valid-test + max-source-positions
        filtering, fairseq_task.py:168-199 parity).

        data_rank/data_world: multi-host ROW sharding — every process forms
        the same frozen global batches, then collates only rows
        [data_rank::data_world] of each, padded to shapes computed from
        global metadata (dataset.collate_meta) so all processes compile the
        same program and ``put_batch`` can assemble one global array. This
        replaces fairseq's every-Nth-batch ShardedIterator (iterators.py:
        446-459), which cannot give shape-aligned per-process slices.

        num_batch_buckets: --num-batch-buckets N — when >0, the padded
        time dims use N length-quantile buckets computed from the dataset
        (reference BucketPadLengthDataset via num_buckets= consumers,
        fairseq/tasks/translation.py:354 and audio_pretraining.py:158
        which force-enables it on TPU) instead of the default geometric
        snap grid. Static shapes are always on here; this knob trades
        compile count vs padding waste.

        num_workers: collate worker threads (--num-workers; the reference's
        DataLoader workers). Item loading is IO + numpy — both release the
        GIL — so threads overlap wav/zip reads and fbank math across
        batches while keeping in-order, deterministic delivery; <= 1 keeps
        the synchronous path (BufferedIterator still overlaps one batch
        with the device step)."""
        self.max_positions = max_positions
        self.data_rank = data_rank
        self.data_world = data_world
        self.dataset = dataset
        self.max_tokens = max_tokens
        self.max_sentences = max_sentences
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.shuffle = shuffle
        self.snap_shapes = snap_shapes
        self.required_batch_size_multiple = required_batch_size_multiple
        self.num_workers = num_workers
        self.num_batch_buckets = num_batch_buckets
        self._buckets: Optional[np.ndarray] = None
        self.epoch = 1
        self.iterations_in_epoch = 0
        self._frozen_batches: Optional[List[np.ndarray]] = None
        self._itr: Optional[Iterator] = None

    # -- batch formation ----------------------------------------------------

    def _get_frozen_batches(self) -> List[np.ndarray]:
        if self._frozen_batches is None:
            lengths = np.asarray(
                [self.dataset.src_frames(i) for i in range(len(self.dataset))])
            if getattr(self.dataset, "preserve_order", False):
                # stream-order datasets (LM --context-window): the stateful
                # context carry requires blocks in ascending document order,
                # like the reference LMContextWindowDataset whose
                # ordered_indices returns np.arange
                # (fairseq/data/lm_context_window_dataset.py:45-47)
                order = np.arange(len(lengths))
            else:
                order = ordered_indices(lengths, self.shuffle, self.seed, 1)
            if self.num_batch_buckets > 0 and self._buckets is None:
                self._buckets = get_buckets(lengths, self.num_batch_buckets)
                logger.info(
                    f"bucketing source lengths into {len(self._buckets)} "
                    f"buckets: {self._buckets.tolist()}")
            if self.max_positions is not None:
                keep = lengths[order] <= self.max_positions
                if not keep.all():
                    logger.warning(
                        f"filtered {int((~keep).sum())} samples longer than "
                        f"max_positions={self.max_positions}")
                order = order[keep]
            self._frozen_batches = batch_by_size(
                order, lengths, self.max_tokens, self.max_sentences,
                self.required_batch_size_multiple)
        return self._frozen_batches

    def _batches_for_epoch(self, epoch: int) -> List[np.ndarray]:
        batches = list(self._get_frozen_batches())
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(batches)
        # pad so every shard sees the same number of batches, then stride
        n = -(-len(batches) // self.num_shards) * self.num_shards
        if n > len(batches) and batches:
            batches = batches + batches[:n - len(batches)]
        return batches[self.shard_id::self.num_shards]

    # -- epoch control ------------------------------------------------------

    def __len__(self):
        return len(self._batches_for_epoch(self.epoch))

    @property
    def n(self):
        return self.iterations_in_epoch

    def end_of_epoch(self) -> bool:
        return (self._itr is None and self.iterations_in_epoch > 0)

    def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
        if self.iterations_in_epoch == 0 and self._itr is None and offset == 0:
            pass  # fresh epoch
        if hasattr(self.dataset, "set_epoch"):
            # temperature-resampled datasets redraw their corpus mixture
            # per epoch (deterministic in (seed, epoch), so mid-epoch
            # resume re-derives the same composition); their batch list
            # must be reformed (ResamplingDataset
            # can_reuse_epoch_itr_across_epochs=False parity)
            self.dataset.set_epoch(self.epoch)
            if not getattr(self.dataset,
                           "can_reuse_epoch_itr_across_epochs", True):
                self._frozen_batches = None
        batches = self._batches_for_epoch(self.epoch)
        start = offset or self.iterations_in_epoch
        self.iterations_in_epoch = start

        if self.num_workers > 1:
            def gen():
                from concurrent.futures import ThreadPoolExecutor
                depth = 2 * self.num_workers
                nb = len(batches)
                with ThreadPoolExecutor(self.num_workers) as ex:
                    futs = {j: ex.submit(self._collate, batches[j])
                            for j in range(start, min(start + depth, nb))}
                    for i in range(start, nb):
                        batch = futs.pop(i).result()
                        if i + depth < nb:
                            futs[i + depth] = ex.submit(
                                self._collate, batches[i + depth])
                        # consumed-position accounting stays exact for
                        # mid-epoch checkpointing: i+1 batches delivered
                        self.iterations_in_epoch = i + 1
                        yield batch
                self.iterations_in_epoch = 0
                self.epoch += 1
            self._itr = gen()
            return self._itr

        def gen():
            for i in range(start, len(batches)):
                self.iterations_in_epoch = i + 1
                yield self._collate(batches[i])
            self.iterations_in_epoch = 0
            self.epoch += 1
        self._itr = gen()
        return self._itr

    def _snap_time(self, n: int, min_step: int = 16) -> int:
        """Padded source-time size: smallest quantile bucket >= n when
        --num-batch-buckets is active (reference get_bucketed_sizes,
        fairseq/data/data_utils.py:556-564), else the geometric grid."""
        if self._buckets is not None and len(self._buckets):
            pos = int(np.searchsorted(self._buckets, n))
            if pos < len(self._buckets):
                return int(self._buckets[pos])
            return int(n)  # longer than every bucket: exact pad
        return snap_len(n, min_step)

    def _fetch_item(self, i: int):
        """dataset[i], with a private augmentation RandomState derived from
        (seed, epoch, index) when the dataset supports it — so SpecAugment
        draws are identical for any --num-workers and across resume
        (advisor finding r2: the thread pool must not trade determinism)."""
        if getattr(self.dataset, "supports_item_rng", False):
            rng = np.random.RandomState(
                (self.seed * 1_000_003 + self.epoch * 8191 + int(i))
                % (2 ** 32))
            return self.dataset.__getitem__(int(i), rng=rng)
        return self.dataset[int(i)]

    def _collate(self, idxs: np.ndarray) -> Dict[str, Any]:
        if self.data_world > 1:
            return self._collate_row_shard(idxs)
        items = [self._fetch_item(int(i)) for i in idxs]
        kw = {}
        if self.snap_shapes and hasattr(self.dataset, "snap_kwargs"):
            # dataset-owned static-shape policy (raw-audio pretraining:
            # crop target snapped DOWN, no padding)
            kw = self.dataset.snap_kwargs(items)
            if self._buckets is not None:
                # --num-batch-buckets: re-snap the main time dim onto the
                # quantile-bucket menu (keys cover the text/audio datasets)
                for k in ("pad_len", "pad_src_t", "pad_src"):
                    if k in kw:
                        kw[k] = self._snap_time(kw[k])
        elif self.snap_shapes:
            def src_len(it):
                arr = it.src_speech if it.src_speech is not None else it.src_orig
                return arr.shape[0]
            kw = dict(
                pad_batch=snap_len(len(items), 8),
                pad_src_t=self._snap_time(max(src_len(it) for it in items)),
                pad_tgt_t=snap_len(max(it.tgt_speech.shape[0] for it in items)),
                pad_src_txt=snap_len(max(len(it.src_text) for it in items), 8),
                pad_tgt_txt=snap_len(max(len(it.tgt_text) for it in items), 8),
            )
        return self.dataset.collate(items, **kw)

    def _collate_row_shard(self, idxs: np.ndarray) -> Dict[str, Any]:
        """Collate this process's rows of a global batch (see __init__)."""
        rank, world = self.data_rank, self.data_world
        local = [int(i) for i in idxs[rank::world]]
        if hasattr(self.dataset, "snap_kwargs"):
            # dataset-owned shapes: load the whole batch on each process
            # (cheap manifests have collate_meta instead), shard rows
            items_all = [self._fetch_item(int(i)) for i in idxs]
            kw = self.dataset.snap_kwargs(items_all) if self.snap_shapes \
                else {}
            if self._buckets is not None:
                for k in ("pad_len", "pad_src_t", "pad_src"):
                    if k in kw:
                        kw[k] = self._snap_time(kw[k])
            gb = snap_len(len(idxs), 8)
            gb = -(-gb // world) * world
            kw["pad_batch"] = gb // world
            items = items_all[rank::world] or items_all[:1]
            batch = self.dataset.collate(items, **kw)
            if not items_all[rank::world]:
                batch["source"][:] = 0
                batch["source_lens"][:] = 0
            return batch
        meta = None
        if hasattr(self.dataset, "collate_meta"):
            meta = self.dataset.collate_meta([int(i) for i in idxs])
        if meta is None:
            # no cheap metadata (raw-audio path): every process loads the
            # whole batch, keeps its rows — correct, IO-redundant
            items_all = [self._fetch_item(int(i)) for i in idxs]

            def src_len(it):
                a = it.src_speech if it.src_speech is not None else it.src_orig
                return a.shape[0]
            src_t = max(src_len(it) for it in items_all)
            tgt_t = max(it.tgt_speech.shape[0] for it in items_all)
            s_txt = max(len(it.src_text) for it in items_all)
            t_txt = max(len(it.tgt_text) for it in items_all)
            s_ntok = sum(len(it.src_text) for it in items_all)
            t_ntok = sum(len(it.tgt_text) for it in items_all)
            items = items_all[rank::world]
        else:
            src_t, tgt_t, s_txt, t_txt, s_ntok, t_ntok = meta
            items = [self._fetch_item(i) for i in local]
        # global padded batch divisible by world; every rank pads its slice
        # to the same local size (padding rows carry zero lengths)
        gb = snap_len(len(idxs), 8)
        gb = -(-gb // world) * world
        if not items:
            # degenerate tiny batch: collate one row, then mask it out
            items = [self._fetch_item(int(idxs[0]))]
            mask_all = True
        else:
            mask_all = False
        batch = self.dataset.collate(
            items, pad_batch=gb // world,
            pad_src_t=self._snap_time(src_t) if self.snap_shapes else src_t,
            pad_tgt_t=snap_len(tgt_t) if self.snap_shapes else tgt_t,
            pad_src_txt=snap_len(s_txt, 8) if self.snap_shapes else s_txt,
            pad_tgt_txt=snap_len(t_txt, 8) if self.snap_shapes else t_txt)
        if mask_all:
            for k in ("src_speech", "tgt_speech", "prev_output_tokens"):
                batch[k][:] = 0
            for k in ("src_text", "tgt_text", "prev_src_text_tokens",
                      "prev_tgt_text_tokens"):
                batch[k][:] = 1  # PAD
            for k in ("src_speech_lens", "target_lengths", "src_text_len",
                      "tgt_text_len"):
                batch[k][:] = 0
        # CE-normalizer token counts must be GLOBAL (the compiled loss
        # divides by them once over the assembled global batch)
        batch["src_txt_ntokens"] = int(s_ntok)
        batch["tgt_txt_ntokens"] = int(t_ntok)
        return batch

    # -- checkpoint ---------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch,
                "iterations_in_epoch": self.iterations_in_epoch,
                "shuffle": self.shuffle}

    def load_state_dict(self, state: Dict[str, Any]):
        self.epoch = state.get("epoch", 1)
        self.iterations_in_epoch = state.get("iterations_in_epoch", 0)


class GroupedIterator:
    """Chunk an iterator into lists of `chunk_size` (update-freq grouping;
    fairseq/data/iterators.py:486 parity)."""

    def __init__(self, itr, chunk_size: int, skip_remainder_batch: bool = False):
        self.itr = itr
        self.chunk_size = chunk_size
        self.skip_remainder_batch = skip_remainder_batch

    def __iter__(self):
        chunk = []
        for x in self.itr:
            chunk.append(x)
            if len(chunk) == self.chunk_size:
                yield chunk
                chunk = []
        if chunk and not self.skip_remainder_batch:
            yield chunk


class DevicePrefetcher:
    """Keep N groups of device-resident batches in flight ahead of the
    consumer: ``put_fn`` (an async ``jax.device_put`` pytree transfer) is
    issued for upcoming batches while the current step computes, hiding
    host->device transfer latency behind device time. The reference gets
    this from CUDA's async H2D inside DataLoader pinned-memory workers;
    with XLA it's explicit issue-ahead."""

    def __init__(self, groups, put_fn, depth: int = 2):
        self._it = iter(groups)
        self._put = put_fn
        self._depth = max(depth, 1)
        self._buf: list = []
        self._done = False

    def _fill(self):
        while not self._done and len(self._buf) < self._depth:
            try:
                group = next(self._it)
            except StopIteration:
                self._done = True
                return
            self._buf.append((group, [self._put(b) for b in group]))

    def __iter__(self):
        return self

    def __next__(self):
        self._fill()
        if not self._buf:
            raise StopIteration
        host_group, dev_group = self._buf.pop(0)
        self._fill()  # issue the next transfers before the consumer blocks
        return host_group, dev_group


class BufferedIterator:
    """Background-thread prefetch (fairseq/data/iterators.py:551-640
    BufferedIterator parity): __getitem__ + collate run in a daemon thread
    so host data prep overlaps device steps."""

    _END = object()

    def __init__(self, iterable, buffer_size: int = 2):
        import queue
        import threading
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(buffer_size, 1))
        self._exc = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._exc = e
            finally:
                self._queue.put(self._END)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._END:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
