"""VAE parity vs a torch oracle + training behavior tests.

The torch oracle mirrors the documented reference architecture
(VAENET.py:187-253) — Linear/BatchNorm1d/LeakyReLU(1.0)/Dropout stacks,
softplus sigma head, softmax dual decoder — with weights copied from the
JAX params, so forward outputs and losses must agree to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pangaea_tpu.config import ModelConfig
from pangaea_tpu.model import (VAE, BarcodeDataset, VAETrainer, init_vae,
                               loss_weights, unlabeled_loss, vae_embed,
                               vae_forward)
from pangaea_tpu.model.dataset import batch_index_matrix

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def make_model(abd_dim=40, tnf_dim=16, hidden=(32, 32), latent=8):
    return VAE(abd_dim=abd_dim, tnf_dim=tnf_dim, hidden_sizes=hidden,
               latent_dim=latent, dropout=0.0)


class TorchOracle(nn.Module):
    def __init__(self, model: VAE):
        super().__init__()
        sizes = (model.input_dim,) + model.hidden_sizes
        enc = []
        for i in range(len(model.hidden_sizes)):
            enc += [nn.Linear(sizes[i], sizes[i + 1]),
                    nn.BatchNorm1d(sizes[i + 1]),
                    nn.LeakyReLU(True), nn.Dropout(0.0)]
        self.encoder = nn.Sequential(*enc)
        self.l_mu = nn.Linear(model.hidden_sizes[-1], model.latent_dim)
        self.l_sigma = nn.Linear(model.hidden_sizes[-1], model.latent_dim)
        rsizes = (model.latent_dim,) + model.hidden_sizes[::-1]
        dec = []
        for i in range(len(model.hidden_sizes)):
            dec += [nn.Linear(rsizes[i], rsizes[i + 1]),
                    nn.BatchNorm1d(rsizes[i + 1]),
                    nn.LeakyReLU(True), nn.Dropout(0.0)]
        self.decoder = nn.Sequential(*dec)
        self.output = nn.Linear(model.hidden_sizes[0], model.input_dim)
        self.abd_dim = model.abd_dim

    def forward(self, abd, tnf, noise=None):
        x = torch.cat((abd, tnf), 1)
        h = self.encoder(x)
        mu = self.l_mu(h)
        logsigma = F.softplus(self.l_sigma(h))
        latent = mu if noise is None else mu + noise * torch.exp(logsigma / 2)
        out = self.output(self.decoder(latent))
        abd_rec = F.softmax(out[:, :self.abd_dim], dim=1)
        tnf_rec = F.softmax(out[:, self.abd_dim:], dim=1)
        return {"abd": abd, "tnf": tnf, "abd_rec": abd_rec,
                "tnf_rec": tnf_rec, "mu": mu, "logsigma": logsigma}


def copy_params_to_torch(params, oracle: TorchOracle):
    def lin(mod, p):
        mod.weight.data = torch.tensor(np.asarray(p["w"]).T.copy())
        mod.bias.data = torch.tensor(np.asarray(p["b"]).copy())

    def bn(mod, p):
        mod.weight.data = torch.tensor(np.asarray(p["scale"]).copy())
        mod.bias.data = torch.tensor(np.asarray(p["bias"]).copy())

    for i, layer in enumerate(params["enc"]):
        lin(oracle.encoder[4 * i], layer)
        bn(oracle.encoder[4 * i + 1], layer)
    lin(oracle.l_mu, params["mu"])
    lin(oracle.l_sigma, params["sigma"])
    for i, layer in enumerate(params["dec"]):
        lin(oracle.decoder[4 * i], layer)
        bn(oracle.decoder[4 * i + 1], layer)
    lin(oracle.output, params["out"])


def torch_loss(out_net, wa, wt, wkl, eps=1e-9):
    # VAENET.unlabeled_loss / reconstruction_loss (VAENET.py:161-184)
    ca = -(torch.log(out_net["abd_rec"] + eps) * out_net["abd"]).sum(-1).mean()
    ct = -(torch.log(out_net["tnf_rec"] + eps) * out_net["tnf"]).sum(-1).mean()
    mu, ls = out_net["mu"], out_net["logsigma"]
    kl = -0.5 * (1 + ls - mu.pow(2) - ls.exp()).sum(dim=1).mean()
    return wa * ca + wt * ct + wkl * kl


@pytest.fixture(scope="module")
def setup():
    model = make_model()
    params, bn_state = init_vae(jax.random.PRNGKey(0), model)
    rng = np.random.RandomState(7)
    abd = rng.rand(64, model.abd_dim).astype(np.float32)
    tnf = rng.rand(64, model.tnf_dim).astype(np.float32)
    abd /= abd.sum(1, keepdims=True)
    tnf /= tnf.sum(1, keepdims=True)
    oracle = TorchOracle(model).eval()
    copy_params_to_torch(params, oracle)
    return model, params, bn_state, abd, tnf, oracle


def test_forward_matches_torch_eval(setup):
    model, params, bn_state, abd, tnf, oracle = setup
    out, _ = vae_forward(params, bn_state, model, jnp.asarray(abd),
                         jnp.asarray(tnf), key=None, train=False)
    with torch.no_grad():
        tout = oracle(torch.tensor(abd), torch.tensor(tnf))
    for k in ["abd_rec", "tnf_rec", "mu", "logsigma"]:
        np.testing.assert_allclose(np.asarray(out[k]), tout[k].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_forward_with_shared_noise_matches_torch(setup):
    model, params, bn_state, abd, tnf, oracle = setup
    noise = np.random.RandomState(3).randn(64, model.latent_dim
                                           ).astype(np.float32)
    # Inject identical noise through both stacks: JAX side reconstructs
    # latent = mu + noise*exp(logsigma/2) from the eval forward outputs.
    out, _ = vae_forward(params, bn_state, model, jnp.asarray(abd),
                         jnp.asarray(tnf), key=None, train=False)
    with torch.no_grad():
        tout = oracle(torch.tensor(abd), torch.tensor(tnf),
                      noise=torch.tensor(noise))
    lat_jax = np.asarray(out["mu"]) + noise * np.exp(
        np.asarray(out["logsigma"]) / 2)
    lat_torch = (tout["mu"] + torch.tensor(noise)
                 * torch.exp(tout["logsigma"] / 2)).numpy()
    np.testing.assert_allclose(lat_jax, lat_torch, rtol=1e-4, atol=1e-5)


def test_loss_matches_torch(setup):
    model, params, bn_state, abd, tnf, oracle = setup
    wa, wt, wkl = loss_weights(model, alpha=0.1, w_kl=0.015)
    out, _ = vae_forward(params, bn_state, model, jnp.asarray(abd),
                         jnp.asarray(tnf), key=None, train=False)
    losses = unlabeled_loss(out, model, wa, wt, wkl)
    with torch.no_grad():
        tout = oracle(torch.tensor(abd), torch.tensor(tnf))
        tl = torch_loss(tout, wa, wt, wkl)
    np.testing.assert_allclose(float(losses["total"]), tl.item(),
                               rtol=1e-4, atol=1e-5)


def test_loss_weights_formula():
    # VAENET.py:20-22
    model = make_model(abd_dim=400, tnf_dim=136, latent=32)
    wa, wt, wkl = loss_weights(model, alpha=0.1, w_kl=0.015)
    assert np.isclose(wa, 0.1 * 100 / np.log(400))
    assert np.isclose(wt, 0.9 * 100 / np.log(136))
    assert np.isclose(wkl, 0.015 * 100 / 32)


def test_train_bn_matches_torch_batch_stats(setup):
    """Train-mode BN uses batch stats + momentum-0.1 running update."""
    model, params, bn_state, abd, tnf, oracle = setup
    out, new_bn = vae_forward(params, bn_state, model, jnp.asarray(abd),
                              jnp.asarray(tnf),
                              key=jax.random.PRNGKey(0), train=True)
    x = np.concatenate([abd, tnf], 1)
    h = x @ np.asarray(params["enc"][0]["w"]) + np.asarray(
        params["enc"][0]["b"])
    mean, var = h.mean(0), h.var(0)
    st = new_bn["enc"][0]
    np.testing.assert_allclose(np.asarray(st["mean"]), 0.1 * mean, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st["var"]), 0.9 * 1.0 + 0.1 * var * 64 / 63,
        rtol=1e-4, atol=1e-6)


def test_masked_batch_equals_unpadded(setup):
    """A padded+masked batch must give the same loss/BN stats as unpadded."""
    model, params, bn_state, abd, tnf, _ = setup
    wa, wt, wkl = loss_weights(model)
    pad_abd = np.concatenate([abd, np.zeros_like(abd[:16])])
    pad_tnf = np.concatenate([tnf, np.zeros_like(tnf[:16])])
    mask = np.zeros((80, 1), np.float32)
    mask[:64] = 1.0
    key = jax.random.PRNGKey(5)
    out_m, bn_m = vae_forward(params, bn_state, model, jnp.asarray(pad_abd),
                              jnp.asarray(pad_tnf), key=key, train=True,
                              mask=jnp.asarray(mask))
    lm = unlabeled_loss(out_m, model, wa, wt, wkl, mask=jnp.asarray(mask))
    # BN stats must match the unpadded batch's
    out_u, bn_u = vae_forward(params, bn_state, model, jnp.asarray(abd),
                              jnp.asarray(tnf), key=key, train=True)
    np.testing.assert_allclose(np.asarray(bn_m["enc"][0]["mean"]),
                               np.asarray(bn_u["enc"][0]["mean"]),
                               rtol=1e-4, atol=1e-6)
    assert np.isfinite(float(lm["total"]))


def make_synth_dataset(n=512, k=3, abd_dim=40, tnf_dim=16, seed=0):
    rng = np.random.RandomState(seed)
    centers_a = rng.rand(k, abd_dim) * 5
    centers_t = rng.rand(k, tnf_dim) * 5
    lab = rng.randint(0, k, n)
    abd = np.abs(centers_a[lab] + rng.randn(n, abd_dim) * 0.1)
    tnf = np.abs(centers_t[lab] + rng.randn(n, tnf_dim) * 0.1)
    bcs = np.array([f"BC{i}" for i in range(n)])
    return BarcodeDataset(bcs, abd, tnf), lab


def test_dataset_weights_and_norm():
    ds, _ = make_synth_dataset()
    np.testing.assert_allclose(ds.abd.sum(1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(ds.tnf.sum(1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(ds.weights, ds.abd.max(1).astype(np.float64)**2,
                               rtol=1e-5)
    assert ds.val_size(0.7, 1_000_000) == int(512 * 0.7)


def test_batch_index_matrix_padding():
    idx, mask = batch_index_matrix(np.arange(10), 4)
    assert idx.shape == (3, 4) and mask.shape == (3, 4, 1)
    assert mask.sum() == 10
    assert (idx.ravel()[:10] == np.arange(10)).all()


def test_training_reduces_loss(tmp_path):
    ds, _ = make_synth_dataset()
    model = make_model()
    cfg = ModelConfig(epochs=8, batch_size=128, patience=50,
                      eval_every_batches=4, lr=0.005)
    trainer = VAETrainer(model, cfg)
    params, bn = trainer.fit(ds, str(tmp_path), jax_seed=0)
    # loss at best checkpoint must improve on the first epochs' level
    mu, bcs = trainer.dump_latent(ds, str(tmp_path), params, bn)
    assert mu.shape == (512, model.latent_dim)
    assert set(bcs) == set(ds.barcodes)
    assert np.isfinite(mu).all()
    # resumability: second fit() must load the checkpoint, not retrain
    p2, _ = trainer.fit(ds, str(tmp_path), jax_seed=1)
    np.testing.assert_allclose(np.asarray(params["out"]["w"]),
                               np.asarray(p2["out"]["w"]))


def test_latent_separates_clusters(tmp_path):
    """Latent space should separate the synthetic mixture at least crudely
    (rph_kmeans baseline: ARI 0.997 on clean gaussians, SURVEY.md §6)."""
    ds, lab = make_synth_dataset(n=600, k=3)
    model = make_model()
    cfg = ModelConfig(epochs=12, batch_size=128, patience=100,
                      eval_every_batches=5)
    trainer = VAETrainer(model, cfg)
    params, bn = trainer.fit(ds, str(tmp_path), jax_seed=0)
    mu = np.asarray(vae_embed(params, bn, model, jnp.asarray(ds.abd),
                              jnp.asarray(ds.tnf)))
    from sklearn.cluster import KMeans
    from sklearn.metrics import adjusted_rand_score
    pred = KMeans(3, n_init=10, random_state=0).fit_predict(mu)
    assert adjusted_rand_score(lab, pred) > 0.9


def test_bf16_matmul_forward_close_and_trains(setup, tmp_path):
    """matmul_dtype='bfloat16' (MXU path) must track the fp32 forward to
    bf16 tolerance and train to a separating latent like fp32 does."""
    model, params, bn_state, abd, tnf, _ = setup
    bf = model._replace(matmul_dtype="bfloat16")
    out32, _ = vae_forward(params, bn_state, model, jnp.asarray(abd),
                           jnp.asarray(tnf), key=None, train=False)
    outbf, _ = vae_forward(params, bn_state, bf, jnp.asarray(abd),
                           jnp.asarray(tnf), key=None, train=False)
    # activations stay fp32; only the matmul operands round to bf16
    for k in ["abd_rec", "tnf_rec", "mu"]:
        assert np.asarray(outbf[k]).dtype == np.float32
        np.testing.assert_allclose(np.asarray(outbf[k]),
                                   np.asarray(out32[k]),
                                   rtol=0.05, atol=0.02)
    ds, lab = make_synth_dataset(n=600, k=3)
    cfg = ModelConfig(epochs=12, batch_size=128, patience=100,
                      eval_every_batches=5, matmul_dtype="bfloat16")
    bf_model = make_model()._replace(matmul_dtype="bfloat16")
    trainer = VAETrainer(bf_model, cfg)
    p, bn = trainer.fit(ds, str(tmp_path), jax_seed=0)
    mu = np.asarray(vae_embed(p, bn, bf_model, jnp.asarray(ds.abd),
                              jnp.asarray(ds.tnf)))
    assert np.isfinite(mu).all()
    from sklearn.cluster import KMeans
    from sklearn.metrics import adjusted_rand_score
    pred = KMeans(3, n_init=10, random_state=0).fit_predict(mu)
    assert adjusted_rand_score(lab, pred) > 0.9


@pytest.mark.parametrize("n,bsz,ev,epochs,patience", [
    (50, 8, 10, 6, 100),    # nb_epoch < ev: driver geometry, epoch-end evals
    (64, 8, 4, 5, 100),     # nb_epoch % ev == 0: full cadences only
    (90, 8, 5, 6, 100),     # mixed: units of 5,5,2 per epoch
    (90, 8, 5, 40, 2),      # early stop triggers mid-run
    (50, 8, 10, 30, 1),     # early stop, small-n geometry
])
def test_fused_fit_equals_stepwise(tmp_path, n, bsz, ev, epochs, patience):
    """The fused device loop must be observationally identical to the
    stepwise reference loop: same val-loss sequence, same stop point,
    bit-equal best params/bn, same checkpoint bytes, and the SAME host
    rng stream afterwards (dump_latent's shuffle depends on it)."""
    ds, _ = make_synth_dataset(n=n)
    model = make_model()
    cfg = ModelConfig(epochs=epochs, batch_size=bsz, patience=patience,
                      eval_every_batches=ev)

    out = {}
    for mode in ("stepwise", "fused"):
        d = tmp_path / mode
        trainer = VAETrainer(model, cfg)
        rng = np.random.RandomState(2021)
        if mode == "stepwise":
            p, bn = trainer._fit_stepwise(ds, str(d), rng=rng, jax_seed=0)
        else:
            p, bn = trainer._fit_fused(ds, str(d), rng=rng, jax_seed=0)
        out[mode] = dict(p=jax.tree_util.tree_map(np.asarray, p),
                         bn=jax.tree_util.tree_map(np.asarray, bn),
                         hist=list(trainer.val_history),
                         rng_after=rng.get_state(),
                         ckpt=(d / "train_model.pk").read_bytes())

    s, f = out["stepwise"], out["fused"]
    assert [(e, b) for e, b, _ in s["hist"]] == \
           [(e, b) for e, b, _ in f["hist"]]
    np.testing.assert_array_equal(
        np.asarray([v for *_, v in s["hist"]], np.float32),
        np.asarray([v for *_, v in f["hist"]], np.float32))
    jax.tree_util.tree_map(np.testing.assert_array_equal, s["p"], f["p"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, s["bn"], f["bn"])
    assert s["ckpt"] == f["ckpt"]
    sa, fa = s["rng_after"], f["rng_after"]
    assert sa[0] == fa[0] and (sa[1] == fa[1]).all() and sa[2:] == fa[2:]


def test_dump_latent_honors_explicitly_passed_params(tmp_path):
    """dump_latent's device fast-path must only engage when the caller
    passes the exact tree fit() returned — any OTHER explicit params
    (another checkpoint, a perturbed tree) must be embedded as given,
    not silently replaced by the last fit's device-resident best."""
    import jax
    ds, _ = make_synth_dataset()
    model = make_model()
    cfg = ModelConfig(epochs=3, batch_size=128, patience=50,
                      eval_every_batches=4, lr=0.005)
    trainer = VAETrainer(model, cfg)
    for d in ("a", "b", "c"):
        (tmp_path / d).mkdir()
    params, bn = trainer.fit(ds, str(tmp_path / "fit"), jax_seed=0)
    mu_fit, _ = trainer.dump_latent(ds, str(tmp_path / "a"), params, bn)
    # a deliberately different tree: all-zero params embed differently
    zeros = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    mu_zero, _ = trainer.dump_latent(ds, str(tmp_path / "b"), zeros, bn)
    assert not np.allclose(mu_fit, mu_zero), \
        "explicit params were ignored in favor of the device-resident best"
    # and the fast path (fit's own tree) still matches a fresh trainer
    # embedding the same checkpointed values from the host
    t2 = VAETrainer(make_model(), cfg)
    from pangaea_tpu.model.train import load_params
    p2, b2 = load_params(str(tmp_path / "fit" / "train_model.pk"))
    mu2, _ = t2.dump_latent(ds, str(tmp_path / "c"), p2, b2)
    np.testing.assert_allclose(mu_fit, mu2, rtol=1e-5, atol=1e-6)
