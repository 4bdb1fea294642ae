"""Metric logging: windowed meters with cross-host sync + glog-style logs.

TPU-native rebuild of dvt/utils/logging.py: ``SmoothedValue`` keeps a sliding
window and a global total; ``synchronize_between_processes`` uses
``multihost_utils`` (psum over hosts) instead of torch.distributed
all_reduce (:50-54). ``MetricLogger.log_every`` wraps an iterable with
iteration/data timing, ETA, and optional jsonl dumps (:124-189), reporting
device memory from jax instead of torch.cuda.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import sys
import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import jax
import numpy as np

logger = logging.getLogger("dvt_tpu")


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """Sum count/total across hosts (multi-process training)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.array([self.count, self.total], dtype=np.float64)
        arr = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(arr[0])
        self.total = float(arr[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


def _device_mem_mb() -> Optional[float]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1024.0 / 1024.0
    except Exception:
        pass
    return None


class MetricLogger:
    def __init__(self, delimiter: str = "  ", output_file: Optional[str] = None):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.output_file = output_file

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def synchronize_between_processes(self):
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def dump_in_output_file(self, iteration: int, iter_time: float, data_time: float):
        if self.output_file is None or jax.process_index() != 0:
            return
        entry = dict(
            iteration=iteration,
            iter_time=iter_time,
            data_time=data_time,
            **{k: m.median for k, m in self.meters.items()},
        )
        with open(self.output_file, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", n_iterations: Optional[int] = None,
                  start_iteration: int = 0):
        i = start_iteration
        if n_iterations is None:
            n_iterations = len(iterable)  # type: ignore[arg-type]
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.6f}")
        data_time = SmoothedValue(fmt="{avg:.6f}")
        space = len(str(n_iterations))
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or i == n_iterations - 1:
                self.dump_in_output_file(i, iter_time.avg, data_time.avg)
                eta = iter_time.global_avg * (n_iterations - i)
                eta_str = str(datetime.timedelta(seconds=int(eta)))
                mem = _device_mem_mb()
                mem_str = f"mem: {mem:.0f}MB" if mem is not None else ""
                logger.info(
                    self.delimiter.join(
                        [
                            f"{header}",
                            f"[{i:{space}d}/{n_iterations}]",
                            f"eta: {eta_str}",
                            str(self),
                            f"time: {iter_time}",
                            f"data: {data_time}",
                            mem_str,
                        ]
                    )
                )
            i += 1
            end = time.time()
            if i >= n_iterations:
                break
        total_time = time.time() - start_time
        logger.info(
            f"{header} Total time: "
            f"{datetime.timedelta(seconds=int(total_time))} "
            f"({total_time / max(n_iterations - start_iteration, 1):.6f} s / it)"
        )


def setup_logging(output: Optional[str] = None, name: str = "dvt_tpu",
                  level: int = logging.INFO, time_string: Optional[str] = None):
    """glog-style logging; per-process files like the reference's
    ``log.txt.rankN`` (dvt/utils/logging.py:243-278)."""
    root = logging.getLogger(name)
    root.setLevel(level)
    root.propagate = False
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = logging.Formatter(
        fmt="%(levelname).1s%(asctime)s %(process)s %(name)s %(filename)s:%(lineno)s] %(message)s",
        datefmt="%Y%m%d %H:%M:%S",
    )
    if jax.process_index() == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        root.addHandler(sh)
    if output:
        if os.path.splitext(output)[1] in (".txt", ".log"):
            filename = output
        else:
            stamp = f".{time_string}" if time_string else ""
            filename = os.path.join(output, f"log{stamp}.txt")
        if jax.process_index() > 0:
            filename += f".rank{jax.process_index()}"
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root
