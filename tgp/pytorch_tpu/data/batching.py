"""Host-side minibatching.

Replaces torch's DataLoader (reference: code/dsp/data/data.py:27-61) with a
numpy-based iterator: seeded shuffling via a private Generator (the
reference's `use_generator` path, data.py:41-44), full-array slicing (no
per-item collate), and zero-copy hand-off to `jax.device_put`.  A native C++
CSV/shuffle backend can be slotted behind the same interface (see
native/, used by the large-dataset loaders).
"""

from __future__ import annotations

import numpy as np


class ArrayDataset:
    """In-memory (X, Y) dataset. reference: code/dsp/data/data.py:66-88."""

    def __init__(self, X, Y):
        assert X is not None and Y is not None
        assert X.shape[0] == Y.shape[0]
        self.X = np.ascontiguousarray(X)
        self.Y = np.ascontiguousarray(Y)

    def __len__(self):
        return self.X.shape[0]


class DataLoader:
    """Shuffled minibatch iterator over an ArrayDataset.

    Unlike torch's, batches are materialised by fancy-indexing the whole
    epoch permutation once — the per-batch cost is one gather, which feeds
    the TPU via a single host->device transfer per step.
    """

    def __init__(self, dataset: ArrayDataset, batch_size: int,
                 shuffle: bool = True, seed: int | None = 0,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.Generator(np.random.PCG64(seed)) if seed is not None \
            else np.random.default_rng()

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        idx = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            sel = idx[start:start + self.batch_size]
            yield self.dataset.X[sel], self.dataset.Y[sel]
