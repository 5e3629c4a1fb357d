"""Pure-JAX variational autoencoder over (abundance, TNF) barcode features.

Behavior contract (reference src/models/VAENET.py):

- architecture (VAENET.py:187-253): encoder stack of
  Linear -> BatchNorm1d -> LeakyReLU -> Dropout per hidden size
  ([input, 512] -> [512, 512]); heads ``l_mu`` and ``l_sigma`` (softplus on
  the sigma head's output => ``logsigma >= 0``); reparameterization
  ``latent = mu + eps * exp(logsigma / 2)`` (VAENET.py:222-230); mirrored
  decoder stack; one output Linear to abd_dim + tnf_dim, split and
  softmax'ed per head (VAENET.py:238-253).
- the reference constructs ``nn.LeakyReLU(True)`` (VAENET.py:205,217),
  which binds ``negative_slope=1.0`` — i.e. the activation is the
  *identity*. ``negative_slope`` is a config knob here; 1.0 reproduces the
  reference, 0.01 gives a real LeakyReLU.
- loss (VAENET.py:161-184): ``wa*CE(abd) + wt*CE(tnf) + w_kl*KL`` with
  ``CE(x) = -(log(x_rec + 1e-9) * x).sum(-1).mean()`` and
  ``KL = -0.5*(1 + logsigma - mu^2 - exp(logsigma)).sum(-1).mean()``;
  weights ``w_kl = wk*100/latent``, ``wa = alpha*100/ln(abd_dim)``,
  ``wt = (1-alpha)*100/ln(tnf_dim)`` (VAENET.py:20-22).
- BatchNorm1d semantics match torch defaults: eps 1e-5, momentum 0.1,
  biased variance for normalization, *unbiased* variance folded into the
  running stats; eval mode uses running stats.

TPU-native design: parameters are a flat pytree of f32 arrays; the forward
is pure jnp (two ~512-wide matmuls per stack => MXU-friendly at batch
2048); batches may carry a validity mask so the last partial batch of an
epoch runs at the same static shape (mask-aware BN statistics and loss
means). Everything jits and shards over a ('data',) mesh axis with
replicated params.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Dict


class VAE(NamedTuple):
    """Static model geometry."""
    abd_dim: int
    tnf_dim: int
    hidden_sizes: Tuple[int, ...] = (512, 512)
    latent_dim: int = 32
    dropout: float = 0.2
    negative_slope: float = 1.0  # nn.LeakyReLU(True) == slope 1.0
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    loss_eps: float = 1e-9
    # 'bfloat16' runs every matmul on the MXU in bf16 with fp32
    # accumulation (params, activations between layers, BN, and the loss
    # all stay fp32). 'float32' reproduces the reference numerics
    # (torch fp32, VAENET.py:238-253) and is the default.
    matmul_dtype: str = "float32"

    @property
    def input_dim(self) -> int:
        return self.abd_dim + self.tnf_dim


def loss_weights(model: VAE, alpha: float = 0.1, w_kl: float = 0.015
                 ) -> Tuple[float, float, float]:
    """(wa, wt, w_kl) exactly as VAENET.py:20-22."""
    wa = alpha * 100.0 / math.log(model.abd_dim)
    wt = (1.0 - alpha) * 100.0 / math.log(model.tnf_dim)
    wkl = w_kl * 100.0 / model.latent_dim
    return wa, wt, wkl


def _linear_init(key, fan_in: int, fan_out: int) -> Pytree:
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight
    and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias — both reduce to the
    same +-1/sqrt(fan_in) uniform bound."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _bn_init(dim: int) -> Tuple[Pytree, Pytree]:
    params = {"scale": jnp.ones((dim,), jnp.float32),
              "bias": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def init_vae(key: jax.Array, model: VAE) -> Tuple[Pytree, Pytree]:
    """Returns (params, bn_state). Jitted as ONE program: the eager
    version issued one device op per weight tensor (~40 dispatches),
    which through a tunneled backend cost ~10 s of round trips before
    training even started (r4 step-2 decomposition)."""
    return _init_vae_impl(key, model)


@functools.partial(jax.jit, static_argnames=("model",))
def _init_vae_impl(key: jax.Array, model: VAE) -> Tuple[Pytree, Pytree]:
    keys = iter(jax.random.split(key, 2 * len(model.hidden_sizes) + 3))
    enc, enc_bn = [], []
    sizes = (model.input_dim,) + tuple(model.hidden_sizes)
    for i in range(len(model.hidden_sizes)):
        layer = _linear_init(next(keys), sizes[i], sizes[i + 1])
        bn_p, bn_s = _bn_init(sizes[i + 1])
        layer.update(bn_p)
        enc.append(layer)
        enc_bn.append(bn_s)
    mu = _linear_init(next(keys), model.hidden_sizes[-1], model.latent_dim)
    sigma = _linear_init(next(keys), model.hidden_sizes[-1], model.latent_dim)
    dec, dec_bn = [], []
    rsizes = (model.latent_dim,) + tuple(model.hidden_sizes[::-1])
    for i in range(len(model.hidden_sizes)):
        layer = _linear_init(next(keys), rsizes[i], rsizes[i + 1])
        bn_p, bn_s = _bn_init(rsizes[i + 1])
        layer.update(bn_p)
        dec.append(layer)
        dec_bn.append(bn_s)
    out = _linear_init(next(keys), model.hidden_sizes[0], model.input_dim)
    params = {"enc": enc, "mu": mu, "sigma": sigma, "dec": dec, "out": out}
    bn_state = {"enc": enc_bn, "dec": dec_bn}
    return params, bn_state


def _masked_moments(x: jnp.ndarray, mask: Optional[jnp.ndarray]):
    """Mean/biased-var over valid rows; mask is (B, 1) float or None."""
    if mask is None:
        n = jnp.float32(x.shape[0])
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)
        return mean, var, n
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(x * mask, axis=0) / n
    var = jnp.sum(jnp.square(x - mean) * mask, axis=0) / n
    return mean, var, n


def _bn_apply(layer: Pytree, state: Pytree, x: jnp.ndarray, *, train: bool,
              mask: Optional[jnp.ndarray], eps: float, momentum: float):
    if train:
        mean, var, n = _masked_moments(x, mask)
        xhat = (x - mean) * jax.lax.rsqrt(var + eps)
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        xhat = (x - state["mean"]) * jax.lax.rsqrt(state["var"] + eps)
        new_state = state
    return xhat * layer["scale"] + layer["bias"], new_state


def _mm(x: jnp.ndarray, w: jnp.ndarray, model: VAE) -> jnp.ndarray:
    """x @ w under the model's matmul precision policy."""
    if model.matmul_dtype == "bfloat16":
        return jax.lax.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    return x @ w


def _leaky(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    if slope == 1.0:
        return x
    return jnp.where(x >= 0, x, slope * x)


def _dropout(x: jnp.ndarray, rate: float, key) -> jnp.ndarray:
    if rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _stack(layers: List[Pytree], states: List[Pytree], x: jnp.ndarray, *,
           model: VAE, train: bool, mask, drop_keys):
    new_states = []
    for i, (layer, st) in enumerate(zip(layers, states)):
        x = _mm(x, layer["w"], model) + layer["b"]
        x, nst = _bn_apply(layer, st, x, train=train, mask=mask,
                           eps=model.bn_eps, momentum=model.bn_momentum)
        new_states.append(nst)
        x = _leaky(x, model.negative_slope)
        if train:
            x = _dropout(x, model.dropout, drop_keys[i])
    return x, new_states


def vae_forward(params: Pytree, bn_state: Pytree, model: VAE,
                abd: jnp.ndarray, tnf: jnp.ndarray, *,
                key: Optional[jax.Array] = None, train: bool = False,
                mask: Optional[jnp.ndarray] = None):
    """Full forward pass. Returns (out_net dict, new_bn_state).

    out_net mirrors VAENET.py:246-253: abd/tnf (inputs), abd_rec/tnf_rec
    (softmax reconstructions), mu, logsigma.
    """
    nh = len(model.hidden_sizes)
    if train:
        assert key is not None, "train mode needs an rng key"
        ks = jax.random.split(key, 2 * nh + 1)
        enc_drop, noise_key, dec_drop = ks[:nh], ks[nh], ks[nh + 1:]
    else:
        enc_drop = dec_drop = [None] * nh
        noise_key = key
    x = jnp.concatenate([abd, tnf], axis=1)
    h, enc_states = _stack(params["enc"], bn_state["enc"], x, model=model,
                           train=train, mask=mask, drop_keys=enc_drop)
    mu = _mm(h, params["mu"]["w"], model) + params["mu"]["b"]
    logsigma = jax.nn.softplus(
        _mm(h, params["sigma"]["w"], model) + params["sigma"]["b"])
    if noise_key is not None:
        eps = jax.random.normal(noise_key, mu.shape, mu.dtype)
    else:
        eps = jnp.zeros_like(mu)
    latent = mu + eps * jnp.exp(logsigma / 2.0)
    d, dec_states = _stack(params["dec"], bn_state["dec"], latent, model=model,
                           train=train, mask=mask, drop_keys=dec_drop)
    out = _mm(d, params["out"]["w"], model) + params["out"]["b"]
    abd_rec = jax.nn.softmax(out[:, : model.abd_dim], axis=1)
    tnf_rec = jax.nn.softmax(out[:, model.abd_dim:], axis=1)
    out_net = {"abd": abd, "tnf": tnf, "abd_rec": abd_rec,
               "tnf_rec": tnf_rec, "mu": mu, "logsigma": logsigma}
    return out_net, {"enc": enc_states, "dec": dec_states}


def vae_embed(params: Pytree, bn_state: Pytree, model: VAE,
              abd: jnp.ndarray, tnf: jnp.ndarray) -> jnp.ndarray:
    """mu only, eval mode — VAENET.emebdding (VAENET.py:232-236)."""
    x = jnp.concatenate([abd, tnf], axis=1)
    h, _ = _stack(params["enc"], bn_state["enc"], x, model=model,
                  train=False, mask=None,
                  drop_keys=[None] * len(model.hidden_sizes))
    return _mm(h, params["mu"]["w"], model) + params["mu"]["b"]


def _masked_mean(per_row: jnp.ndarray, mask: Optional[jnp.ndarray]):
    if mask is None:
        return jnp.mean(per_row)
    m = mask[:, 0]
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def unlabeled_loss(out_net: Dict, model: VAE, wa: float, wt: float,
                   wkl: float, mask: Optional[jnp.ndarray] = None) -> Dict:
    """VAENET.unlabeled_loss (VAENET.py:161-180), mask-aware."""
    eps = model.loss_eps
    ce_abd = -jnp.sum(jnp.log(out_net["abd_rec"] + eps) * out_net["abd"], -1)
    ce_tnf = -jnp.sum(jnp.log(out_net["tnf_rec"] + eps) * out_net["tnf"], -1)
    mu, logsigma = out_net["mu"], out_net["logsigma"]
    kl = -0.5 * jnp.sum(1 + logsigma - jnp.square(mu) - jnp.exp(logsigma), -1)
    loss_abd = _masked_mean(ce_abd, mask)
    loss_tnf = _masked_mean(ce_tnf, mask)
    loss_kl = _masked_mean(kl, mask)
    total = wa * loss_abd + wt * loss_tnf + wkl * loss_kl
    return {"total": total, "abd_rec": loss_abd, "tnf_rec": loss_tnf,
            "kl_loss": loss_kl}


def l1_normalize(x: np.ndarray) -> np.ndarray:
    """sklearn normalize(x, 'l1') twin: rows of all-zero stay zero."""
    s = np.abs(x).sum(axis=1, keepdims=True)
    s = np.where(s == 0, 1.0, s)
    return x / s
