"""Threaded prefetching batch loader.

Replaces the reference's torch ``DataLoader(num_workers=8, pin_memory=True,
persistent_workers=True)`` (``simcol.py:262-293``). Decode happens in a
thread pool (PIL/cv2 release the GIL), batches are assembled ahead of the
consumer into a bounded queue, and string fields are kept as lists while
array fields are stacked into contiguous numpy batches ready for a single
host->device transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np


def _collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    batch: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class PrefetchLoader:
    """Iterable over batches of a map-style dataset.

    Multi-host: ``process_index``/``process_count`` (defaulting to
    ``jax.process_index()``/``jax.process_count()`` at iteration time)
    shard each GLOBAL batch across processes — every process walks the
    same global batch order (same shuffle seed) and decodes only its
    contiguous ``batch_size / process_count`` slice of each batch, which
    ``parallel.mesh.shard_batch`` then assembles into one global array.
    ``__len__`` and the epoch/step math stay process-independent.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_threads: int = 8,
                 seed: int | None = None, prefetch: int = 4,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _process_shard(self) -> tuple[int, int]:
        pi, pc = self.process_index, self.process_count
        if pc is None:
            import jax

            pc = jax.process_count()
            pi = jax.process_index() if pi is None else pi
        elif pc > 1 and pi is None:
            # Silently mapping to index 0 would make every process decode
            # the SAME slice (quadruplicated "global" batches).
            raise ValueError("process_count > 1 requires an explicit "
                             "process_index")
        return (pi or 0), max(1, pc)

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            _, pc = self._process_shard()
            seed = self.seed
            if seed is None and pc > 1:
                # All processes MUST agree on the global batch order; an
                # OS-entropy shuffle would silently de-synchronize them.
                seed = 0
            rng = np.random.default_rng(
                None if seed is None else seed + self._epoch)
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        order = self._index_order()
        pi, pc = self._process_shard()
        self._epoch += 1
        n_batches = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def safe_put(item) -> bool:
            # Stop-aware blocking put: never blocks forever (the consumer
            # may abandon the iterator with the queue full), never drops
            # the item while the consumer is still listening.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    def submit(b: int):
                        idxs = order[b * self.batch_size:
                                     (b + 1) * self.batch_size]
                        sharded = pc > 1 and len(idxs) % pc == 0
                        if sharded:
                            # This process's contiguous slice of the
                            # global batch (matches the row->device order
                            # of shard_batch's global assembly).
                            per = len(idxs) // pc
                            idxs = idxs[pi * per:(pi + 1) * per]
                        return sharded, [
                            pool.submit(self.dataset.__getitem__, int(i))
                            for i in idxs]

                    # Sliding window: decode a few batches ahead, never the
                    # whole epoch.
                    window: list = []
                    next_b = 0
                    while next_b < n_batches and len(window) <= self.prefetch:
                        window.append(submit(next_b))
                        next_b += 1

                    while window:
                        if stop.is_set():
                            return
                        sharded, futs = window.pop(0)
                        samples = [f.result() for f in futs]
                        batch = _collate(samples)
                        if pc > 1 and not sharded:
                            # Trailing batch not divisible by the process
                            # count: every process decoded ALL rows, so the
                            # consumer must replicate it, not assemble it.
                            batch["_replicated"] = True
                        if not safe_put(batch):
                            return
                        if next_b < n_batches:
                            window.append(submit(next_b))
                            next_b += 1
            except Exception as exc:  # propagate to consumer
                safe_put(exc)
            finally:
                safe_put(None)  # end-of-epoch sentinel (must not be dropped)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
