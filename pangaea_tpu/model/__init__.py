"""JAX VAE model layer (reference: src/models/VAENET.py, src/data.py)."""

from pangaea_tpu.model.vae import (VAE, init_vae, vae_forward, vae_embed,
                                   unlabeled_loss, loss_weights)
from pangaea_tpu.model.dataset import BarcodeDataset
from pangaea_tpu.model.train import VAETrainer, EarlyStopping

__all__ = [
    "VAE", "init_vae", "vae_forward", "vae_embed", "unlabeled_loss",
    "loss_weights", "BarcodeDataset", "VAETrainer", "EarlyStopping",
]
