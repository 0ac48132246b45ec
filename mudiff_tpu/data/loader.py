"""Host-side device feed: shuffled, per-host-sharded, prefetched batches.

The reference pipeline was its own bottleneck — the shipped logs show
33.0s of every 33.3s window spent in the torch DataLoader
(BASELINE.md; engine/train.py:422-433).  This loader removes that class
of problem the TPU way:

* whole splits live in host RAM (float32 256^2 slices are small),
* batch assembly is one fancy-index gather + clamp (optionally served by
  the native C++ gather in mudiff_tpu/data/_native when built),
* a background thread keeps ``prefetch`` batches ahead, already
  device-resident with the batch sharding, so the TPU never waits on
  the host,
* per-host sharding for multi-host: each process sees its
  process_index-strided subset (replaces DistributedSampler,
  engine/train.py:409-411).  ``batch_size`` is always the GLOBAL batch;
  each host gathers only its ``batch_size / process_count`` local rows
  and the global array is assembled with
  ``jax.make_array_from_process_local_data`` — a host never materializes
  (or transfers) other hosts' rows.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from mudiff_tpu.data.datasets import SliceDataset

Batch = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]


def _put_or_stop(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """put() that gives up when the consumer abandoned the iterator —
    otherwise a full queue would block the producer thread forever and
    leak it (plus its device-resident batches)."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


class DeviceLoader:
    def __init__(
        self,
        dataset: SliceDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # pad_last: keep the tail batch by repeating its last slice up to
        # batch_size (keeps shapes static for jit; implies drop_last=False)
        self.pad_last = pad_last
        if pad_last:
            self.drop_last = False
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )
        assert batch_size % self.process_count == 0, (
            f"global batch {batch_size} not divisible by "
            f"{self.process_count} processes"
        )
        # rows THIS host contributes to every global batch
        self.local_batch_size = batch_size // self.process_count

    def _shard_len(self) -> int:
        # all hosts use the same (floor) shard length so every process
        # runs the same number of jitted steps (SPMD lockstep)
        return len(self.dataset) // self.process_count

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.local_batch_size
        return -(-n // self.local_batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # per-host strided shard (DistributedSampler semantics), truncated
        # to the common floor length so all hosts stay in lockstep
        return idx[self.process_index::self.process_count][: self._shard_len()]

    def _to_device(self, x: np.ndarray):
        """Local host rows -> device-resident (global) array."""
        if self.sharding is None:
            return jax.device_put(x)
        if self.process_count == 1:
            return jax.device_put(x, self.sharding)
        # Multi-host: x holds only THIS host's batch_size/process_count
        # rows.  device_put of a host-local array onto a sharding that
        # spans non-addressable devices is wrong (and each host's array
        # differs); the correct primitive assembles the global array
        # from per-process shards.
        # x.shape[0] is the LOCAL row count — for a partial final batch
        # (drop_last=False without pad_last) it is smaller than
        # batch_size/process_count, and claiming the full batch_size as
        # the global shape would raise a mismatch mid-epoch.
        global_shape = (x.shape[0] * self.process_count,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            self.sharding, x, global_shape
        )

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        """Iterate device-resident batches for one epoch."""
        idx = self._epoch_indices(epoch)
        lbs = self.local_batch_size
        nb = len(idx) // lbs
        if not self.drop_last and len(idx) % lbs:
            nb += 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * lbs:(b + 1) * lbs]
                    if self.pad_last and len(sel) < lbs:
                        sel = np.concatenate(
                            [sel, np.repeat(sel[-1:], lbs - len(sel))]
                        )
                    host = self.dataset.gather_batch(np.sort(sel))
                    dev = tuple(self._to_device(x) for x in host)
                    if not _put_or_stop(q, dev, stop):
                        return
                _put_or_stop(q, None, stop)
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
