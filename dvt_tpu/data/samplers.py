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
        if num_samples <= 0:
            raise ValueError(
                "InfiniteSampler over an empty dataset would busy-spin "
                "forever (check the data root / list file)")
        self.num_samples = num_samples

    def __iter__(self) -> Iterator[int]:
        while True:
            yield from range(self.num_samples)


class DistributedInfiniteSampler:
    """NOTE on shuffling: the reference sampler (sampler.py:33-42)
    shuffles the stripe ONCE with an epoch-seeded RNG and then replays
    that same permutation forever (set_epoch has no effect after __iter__
    starts). The default here is reference-exact; pass
    ``reshuffle_each_pass=True`` for a fresh permutation per pass (better
    SGD mixing for long runs)."""

    def __init__(self, num_samples: int, num_replicas: int = 1, rank: int = 0,
                 reshuffle_each_pass: bool = False):
        self.total = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.reshuffle_each_pass = reshuffle_each_pass
        self.num_samples = math.ceil(num_samples / num_replicas)
        if np.arange(self.total)[rank::num_replicas].size == 0:
            # an empty stripe would busy-spin forever in __iter__ with the
            # DataLoader producer pegging the CPU and no error surfacing
            raise ValueError(
                f"rank {rank}/{num_replicas} gets an empty stripe of a "
                f"{num_samples}-sample dataset - fewer samples than "
                "replicas (or an empty dataset)")

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        epoch = self.epoch
        stripe = np.arange(self.total)[self.rank :: self.num_replicas]
        while True:
            rng = np.random.default_rng(epoch)
            perm = stripe.copy()
            rng.shuffle(perm)
            yield from perm.tolist()
            if self.reshuffle_each_pass:
                epoch += 1

    def __len__(self) -> int:
        return self.num_samples
