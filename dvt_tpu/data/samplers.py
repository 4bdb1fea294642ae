"""Index samplers: infinite streams, with per-process striping for DP.

Rebuilds dvt/dataset/sampler.py on numpy: ``InfiniteSampler`` loops the
dataset forever; ``DistributedInfiniteSampler`` stripes indices i::world_size
per process and shuffles its own stripe with an epoch-seeded RNG (:19-45),
which is exactly what each host of a data-parallel TPU job consumes.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np


class InfiniteSampler:
    def __init__(self, num_samples: int):
        self.num_samples = num_samples

    def __iter__(self) -> Iterator[int]:
        while True:
            yield from range(self.num_samples)


class DistributedInfiniteSampler:
    def __init__(self, num_samples: int, num_replicas: int = 1, rank: int = 0):
        self.total = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = math.ceil(num_samples / num_replicas)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.epoch)
        stripe = np.arange(self.total)[self.rank :: self.num_replicas]
        rng.shuffle(stripe)
        while True:
            yield from stripe.tolist()

    def __len__(self) -> int:
        return self.num_samples
