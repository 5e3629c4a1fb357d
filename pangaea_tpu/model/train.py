"""VAE training loop: TPU-resident data, scanned train blocks, early stop.

Behavior contract (reference src/models/VAENET.py:31-159 + src/utils.py:26-52):

- Adam(lr, weight_decay) with torch's coupled L2 (decay added to the grad
  before the moment update) (VAENET.py:39).
- every 100 train batches: full val pass; early stopping on the mean of
  per-batch val totals, delta 1e-6 (VAENET.py:64-91, pangaea.py pat. 20).
  The val forward runs in eval mode (no dropout, running BN stats) but
  *does* sample the latent noise — torch.randn at VAENET.py:227 fires
  regardless of .eval().
- at epoch end a val pass + early() happens only when the number of train
  batches is not a multiple of 100 (VAENET.py:111-115).
- the checkpoint written on each val improvement is the one reloaded for
  the final latent dump (utils.py:50-52, VAENET.py:131), i.e. inference
  uses the *best* model; the latent is mu only, data order shuffled, with
  barcodes saved in matching order (VAENET.py:126-144).

TPU-native design: the full (abd, tnf) matrix is device-resident; an
"interval" (the 100 batches between evals) is one jitted lax.scan whose
input is just a (nb, batch) int32 index block => one host sync per eval
cadence instead of per batch. Shapes are static per (nb, batch); at most
two distinct nb values occur (100 and the epoch remainder).
"""

from __future__ import annotations

import functools
import logging
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pangaea_tpu.config import ModelConfig
from pangaea_tpu.model.dataset import BarcodeDataset, batch_index_matrix
from pangaea_tpu.model.vae import (VAE, init_vae, loss_weights,
                                   unlabeled_loss, vae_embed, vae_forward)

log = logging.getLogger(__name__)


class EarlyStopping:
    """utils.py:26-52 minus torch: tracks best val loss, saves via callback."""

    def __init__(self, patience: int = 7, delta: float = 0.0,
                 save_fn=None):
        self.patience = patience
        self.delta = delta
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = np.inf
        self.save_fn = save_fn or (lambda: None)

    def __call__(self, val_loss: float) -> None:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self._save(val_loss)
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self._save(val_loss)
            self.counter = 0

    def _save(self, val_loss: float) -> None:
        self.save_fn()
        self.val_loss_min = val_loss


def save_params(path: str, params, bn_state) -> None:
    host = jax.tree_util.tree_map(np.asarray, (params, bn_state))
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_params(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


class VAETrainer:
    def __init__(self, model: VAE, cfg: ModelConfig,
                 data_sharding=None):
        self.model = model
        self.cfg = cfg
        self.wa, self.wt, self.wkl = loss_weights(
            model, cfg.weight_alpha, cfg.weight_kl)
        # torch Adam parity: L2 folded into the grad, then Adam moments.
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-cfg.lr),
        )
        self.data_sharding = data_sharding
        self._train_block = jax.jit(self._train_block_impl,
                                    donate_argnums=(0, 1, 2))
        self._val_block = jax.jit(self._val_block_impl)
        self._embed_block = jax.jit(self._embed_block_impl)

    # ---- jitted blocks ----------------------------------------------------

    def _loss_and_state(self, params, bn_state, abd, tnf, mask, key):
        out, new_bn = vae_forward(params, bn_state, self.model, abd, tnf,
                                  key=key, train=True, mask=mask)
        losses = unlabeled_loss(out, self.model, self.wa, self.wt, self.wkl,
                                mask=mask)
        return losses["total"], (losses, new_bn)

    def _train_block_impl(self, params, opt_state, bn_state, key,
                          abd_all, tnf_all, idx, mask):
        """One scanned interval of train steps. idx: (nb, B) int32."""
        grad_fn = jax.value_and_grad(self._loss_and_state, has_aux=True)

        def step(carry, xs):
            params, opt_state, bn_state, key = carry
            bidx, bmask = xs
            key, sub = jax.random.split(key)
            abd = abd_all[bidx]
            tnf = tnf_all[bidx]
            (_, (losses, new_bn)), grads = grad_fn(
                params, bn_state, abd, tnf, bmask, sub)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            stats = jnp.stack([losses["total"], losses["abd_rec"],
                               losses["tnf_rec"], losses["kl_loss"]])
            return (params, opt_state, new_bn, key), stats

        (params, opt_state, bn_state, key), stats = jax.lax.scan(
            step, (params, opt_state, bn_state, key), (idx, mask))
        return params, opt_state, bn_state, key, jnp.mean(stats, axis=0)

    def _val_block_impl(self, params, bn_state, key, abd_all, tnf_all,
                        idx, mask):
        """Per-batch val totals (eval mode, latent noise on)."""
        def step(key, xs):
            bidx, bmask = xs
            key, sub = jax.random.split(key)
            out, _ = vae_forward(params, bn_state, self.model,
                                 abd_all[bidx], tnf_all[bidx],
                                 key=sub, train=False, mask=bmask)
            losses = unlabeled_loss(out, self.model, self.wa, self.wt,
                                    self.wkl, mask=bmask)
            return key, losses["total"]

        _, totals = jax.lax.scan(step, key, (idx, mask))
        return totals

    def _embed_block_impl(self, params, bn_state, abd_all, tnf_all, idx):
        def step(_, bidx):
            return None, vae_embed(params, bn_state, self.model,
                                   abd_all[bidx], tnf_all[bidx])
        _, mu = jax.lax.scan(step, None, idx)
        return mu.reshape(-1, self.model.latent_dim)

    # ---- host loop --------------------------------------------------------

    def fit(self, dataset: BarcodeDataset, model_dir: str,
            rng: Optional[np.random.RandomState] = None,
            jax_seed: int = 0) -> Tuple[Dict, Dict]:
        """Train (resumable); returns (params, bn_state) of the best model."""
        cfg, model = self.cfg, self.model
        rng = rng or np.random.RandomState(cfg.seed)
        os.makedirs(model_dir, exist_ok=True)
        ckpt = os.path.join(model_dir, "train_model.pk")

        params, bn_state = init_vae(jax.random.PRNGKey(jax_seed), model)
        if os.path.exists(ckpt):
            log.info("training model already saved")
            params, bn_state = load_params(ckpt)
            return params, bn_state

        opt_state = self.tx.init(params)
        key = jax.random.PRNGKey(jax_seed + 1)
        abd_all = jnp.asarray(dataset.abd)
        tnf_all = jnp.asarray(dataset.tnf)

        best = {"params": params, "bn": bn_state}

        def save_best():
            # snapshot to host: the live device buffers are donated to the
            # next train block and would be invalidated.
            host_p, host_bn = jax.tree_util.tree_map(
                np.asarray, (params, bn_state))
            best["params"], best["bn"] = host_p, host_bn
            save_params(ckpt, host_p, host_bn)

        early = EarlyStopping(patience=cfg.patience,
                              delta=cfg.early_stop_delta, save_fn=save_best)
        n = len(dataset)
        val_size = dataset.val_size(cfg.val_fraction, cfg.val_max)
        bsz = min(cfg.batch_size, n)
        nb_epoch = -(-n // bsz)
        ev = cfg.eval_every_batches

        def run_val(key):
            vidx = dataset.sample_indices(rng, val_size, replacement=False)
            vmat, vmask = batch_index_matrix(vidx, bsz)
            key, sub = jax.random.split(key)
            totals = self._val_block(params, bn_state, sub, abd_all, tnf_all,
                                     jnp.asarray(vmat), jnp.asarray(vmask))
            return key, float(jnp.mean(totals))

        log.info("train start")
        for epoch in range(1, cfg.epochs + 1):
            tidx = dataset.sample_indices(rng, n, replacement=True)
            tmat, tmask = batch_index_matrix(tidx, bsz)
            done = 0
            while done < nb_epoch and not early.early_stop:
                nb = min(ev, nb_epoch - done)
                block_idx = jnp.asarray(tmat[done:done + nb])
                block_mask = jnp.asarray(tmask[done:done + nb])
                params, opt_state, bn_state, key, stats = self._train_block(
                    params, opt_state, bn_state, key, abd_all, tnf_all,
                    block_idx, block_mask)
                done += nb
                if nb == ev:  # the reference evals only on full cadences
                    key, val_loss = run_val(key)
                    t, a, tn, kl = np.asarray(stats)
                    log.info(
                        "epoch %d/%d batch %d/%d: train %.8f abd %.8f "
                        "tnf %.8f kl %.8f | test %.8f", epoch, cfg.epochs,
                        done, nb_epoch, t, a, tn, kl, val_loss)
                    early(val_loss)
            if early.early_stop:
                log.info("early stop triggered")
                break
            if nb_epoch % ev != 0:  # VAENET.py:111-115
                key, val_loss = run_val(key)
                early(val_loss)
                if early.early_stop:
                    log.info("early stop triggered")
                    break
        if not os.path.exists(ckpt):
            save_params(ckpt, params, bn_state)
            best["params"], best["bn"] = params, bn_state
        return best["params"], best["bn"]

    def dump_latent(self, dataset: BarcodeDataset, model_dir: str,
                    params=None, bn_state=None,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Best-model mu for every barcode, shuffled order (VAENET.py:126-144).

        Writes latent.npz + barcodes.npz; returns (embedding, barcodes).
        """
        latent_path = os.path.join(model_dir, "latent.npz")
        barcodes_path = os.path.join(model_dir, "barcodes.npz")
        if os.path.exists(latent_path) and os.path.exists(barcodes_path):
            log.info("latent and barcodes already saved")
            return (np.load(latent_path)["arr_0"],
                    np.load(barcodes_path)["arr_0"])
        if params is None:
            params, bn_state = load_params(
                os.path.join(model_dir, "train_model.pk"))
        rng = rng or np.random.RandomState(self.cfg.seed)
        n = len(dataset)
        order = rng.permutation(n).astype(np.int32)
        bsz = min(self.cfg.batch_size, n)
        idx, _ = batch_index_matrix(order, bsz)
        abd_all = jnp.asarray(dataset.abd)
        tnf_all = jnp.asarray(dataset.tnf)
        mu = np.asarray(self._embed_block(params, bn_state, abd_all, tnf_all,
                                          jnp.asarray(idx)))[:n]
        barcodes = dataset.barcodes[order]
        np.savez(barcodes_path, barcodes)
        np.savez(latent_path, mu)
        return mu, barcodes
