"""Barcode feature dataset: normalization + weighted sampling.

Behavior contract (reference src/data.py + src/utils.py):

- both feature blocks are L1-row-normalized (data.py:16-21).
- per-barcode sampling weight = (max of the L1-normalized abundance row)^2
  (data.py:17) — barcodes dominated by one abundance bin (likely a single
  species at one coverage) are sampled more.
- the train loader draws ``len(dataset)`` indices *with* replacement, the
  val loader ``min(0.7*N, 1e6)`` *without* replacement, both via
  ``np.random.choice(p=weights/sum)`` (utils.py:11-23, pangaea.py:86-88);
  the inference loader is a plain shuffle (pangaea.py:89).

TPU-native design: the whole feature matrix lives on device (N x 536 f32;
1M barcodes ~ 2.1 GB) and batches are device-side gathers by an index
matrix, so an epoch is one host->device index transfer instead of a
DataLoader stream. Index matrices are padded to a fixed (num_batches,
batch_size) shape with a validity mask => one XLA compilation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from pangaea_tpu.model.vae import l1_normalize


class BarcodeDataset:
    def __init__(self, barcodes: np.ndarray, abundance: np.ndarray,
                 tnf: np.ndarray):
        assert abundance.shape[0] == tnf.shape[0] == len(barcodes)
        self.barcodes = np.asarray(barcodes)
        abd_l1 = l1_normalize(np.asarray(abundance, dtype=np.float64))
        self.weights = (abd_l1.max(axis=1) ** 2).astype(np.float64)
        self.abd = abd_l1.astype(np.float32)
        self.tnf = l1_normalize(np.asarray(tnf, dtype=np.float64)
                                ).astype(np.float32)

    def __len__(self) -> int:
        return self.abd.shape[0]

    @property
    def abd_dim(self) -> int:
        return self.abd.shape[1]

    @property
    def tnf_dim(self) -> int:
        return self.tnf.shape[1]

    def sample_indices(self, rng: np.random.RandomState, num_samples: int,
                       replacement: bool = True) -> np.ndarray:
        """CustomWeightedRandomSampler (utils.py:15-23)."""
        p = self.weights / self.weights.sum()
        return rng.choice(len(self), size=num_samples, p=p,
                          replace=replacement).astype(np.int32)

    def val_size(self, fraction: float = 0.7, cap: int = 1_000_000) -> int:
        """test_size = min(int(0.7*N), 1e6) (pangaea.py:86)."""
        return min(int(len(self) * fraction), cap)


def batch_index_matrix(indices: np.ndarray, batch_size: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a flat index vector to (num_batches, batch_size) + float mask.

    Mirrors DataLoader batching with a final partial batch
    (drop_last=False); pad rows repeat index 0 and are masked out.
    """
    n = len(indices)
    nb = max(1, -(-n // batch_size))
    idx = np.zeros((nb, batch_size), dtype=np.int32)
    mask = np.zeros((nb, batch_size, 1), dtype=np.float32)
    flat = np.asarray(indices, dtype=np.int32)
    idx.ravel()[:n] = flat
    mask.ravel()[:n] = 1.0
    return idx, mask
