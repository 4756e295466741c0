"""Multi-host data sharding.

The reference's input parallelism is 8 DataLoader worker processes on one
host (reference: wavenet_training.py:55-59). On a TPU pod slice each host
feeds only its addressable shard of the global batch: host h takes every
``process_count``-th batch index block, builds its local arrays, and
assembles a global jax.Array from per-device shards
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataset import WaveNetDataset
from .mesh import DATA_AXIS


class ShardedBatchIterator:
    """Per-host shard of a global shuffled batch stream.

    Every host iterates the same seeded permutation, takes the slice of each
    global batch belonging to its processes' devices, and yields global
    jax.Arrays sharded over the mesh's data axis. Single-host (the common
    test case) degenerates to BatchIterator + device_put.
    """

    def __init__(
        self,
        dataset: WaveNetDataset,
        global_batch_size: int,
        mesh: Mesh,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        if global_batch_size % jax.process_count() != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{jax.process_count()} processes"
            )
        n_data = mesh.shape.get(DATA_AXIS, 1)
        if global_batch_size % n_data != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by the "
                f"data axis size {n_data}"
            )
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // jax.process_count()
        self.mesh = mesh
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = NamedSharding(mesh, P(DATA_AXIS))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return math.ceil(n / self.global_batch_size)

    def __iter__(self):
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        lo = jax.process_index() * self.local_batch_size
        hi = lo + self.local_batch_size
        for i in range(0, n, self.global_batch_size):
            idxs = order[i : i + self.global_batch_size]
            if self.drop_last and len(idxs) < self.global_batch_size:
                return
            local = idxs[lo:hi]
            x, y = self.dataset.get_batch(local)
            yield (
                jax.make_array_from_process_local_data(self.sharding, x),
                jax.make_array_from_process_local_data(self.sharding, y),
            )
