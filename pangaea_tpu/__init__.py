"""pangaea_tpu — a TPU-native linked-read metagenome assembly engine.

A brand-new framework (JAX/XLA/Pallas/pjit + native C++ host runtime) with the
capabilities of ericcombiolab/Pangaea:

- barcode-aware k-mer abundance + tetranucleotide (TNF) feature extraction as
  XLA/Pallas kernels over 2-bit-encoded read batches (replaces the reference's
  jellyfish + src/cpptools/count_kmer.cpp + count_tnf.cpp),
- a variational-autoencoder read binner trained with jit/pjit data parallelism
  (replaces src/models/VAENET.py / PyTorch),
- RPH-KMeans random-projection clustering as pure-XLA ops
  (replaces third_parties/rph_kmeans),
- multi-threshold reassembly + ensemble merging orchestration
  (replaces src/scripts/*.sh + src/clustering.py step 4),
- a resumable 4-step pipeline and end-to-end driver
  (replaces src/pangaea.py + src/run_pangaea).

Reference file:line citations in docstrings point into the upstream repo
(mounted read-only) and document the behavior contract being reproduced —
the implementation here is TPU-first, not a translation.
"""

__version__ = "0.1.0"

from pangaea_tpu.config import PangaeaConfig  # noqa: F401

_LAZY = {
    "FeatureExtractor": ("pangaea_tpu.features", "FeatureExtractor"),
    "BarcodeDataset": ("pangaea_tpu.model", "BarcodeDataset"),
    "VAE": ("pangaea_tpu.model", "VAE"),
    "VAETrainer": ("pangaea_tpu.model", "VAETrainer"),
    "RPHKMeans": ("pangaea_tpu.cluster", "RPHKMeans"),
    "clustering_rph_kmeans": ("pangaea_tpu.cluster", "clustering_rph_kmeans"),
    "select_k_with_bic": ("pangaea_tpu.cluster", "select_k_with_bic"),
    "Pipeline": ("pangaea_tpu.pipeline", "Pipeline"),
}


def __getattr__(name):
    """Lazy re-exports of the heavier layers (model/cluster/pipeline pull
    in jax/optax/sklearn; keep base import light)."""
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
