"""Host-side batching + background prefetch to device.

Replaces torch DataLoader(num_workers=8, pin_memory) in the reference mains:
a thread pool maps ``dataset[i]`` over a sampler's index stream, batches are
stacked and (optionally) device_put with a sharding while the TPU computes
the previous step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


def _stack(batch):
    out: Dict[str, np.ndarray] = {}
    for k in batch[0]:
        vals = [b[k] for b in batch]
        out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else np.asarray(vals)
    return out


class DataLoader:
    """Minimal infinite loader: sampler indices -> threaded fetch -> batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler,
        num_workers: int = 8,
        prefetch_depth: int = 2,
        device_put_fn: Optional[Callable[[Any], Any]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(num_workers, 1)
        self.prefetch_depth = prefetch_depth
        self.device_put_fn = device_put_fn

    def __iter__(self) -> Iterator[Any]:
        idx_iter = iter(self.sampler)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put so a full queue can't wedge shutdown
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # a producer exception must reach the consumer: dying silently
            # would leave the training loop blocked on q.get() forever.
            # Catch Exception (not BaseException): KeyboardInterrupt /
            # SystemExit in a worker thread shouldn't be replayed in the
            # consumer, and a StopIteration from an exhausted finite
            # sampler must be wrapped — re-raising it inside the consumer
            # generator would surface as an opaque PEP-479 RuntimeError.
            # native whole-batch fast path (dataset.get_batch -> C++
            # OpenMP loader, GIL released); one None disables it for the
            # epoch so a missing library / non-JPEG dataset doesn't pay
            # the probe on every batch.
            use_get_batch = hasattr(self.dataset, "get_batch")
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    while not stop.is_set():
                        try:
                            idxs = [next(idx_iter)
                                    for _ in range(self.batch_size)]
                        except StopIteration:
                            put(RuntimeError(
                                "sampler exhausted mid-batch: DataLoader "
                                "expects an infinite sampler"))
                            return
                        batch = None
                        if use_get_batch:
                            batch = self.dataset.get_batch(idxs)
                            use_get_batch = batch is not None
                        if batch is None:
                            items = list(
                                pool.map(self.dataset.__getitem__, idxs))
                            batch = _stack(items)
                        if self.device_put_fn is not None:
                            batch = self.device_put_fn(batch)
                        if not put(batch):
                            return
            except Exception as e:  # noqa: BLE001
                put(e)
            except BaseException as e:  # noqa: BLE001
                # KeyboardInterrupt/SystemExit etc. must not be REPLAYED in
                # the consumer, but the producer dying silently would leave
                # the training loop blocked on q.get() forever - wrap them.
                put(RuntimeError(f"DataLoader producer thread died: {e!r}"))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()
