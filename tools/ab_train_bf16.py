#!/usr/bin/env python
"""A/B the VAE train block fp32 vs bf16-matmul on the real device.

Measures one scanned 200-step block (batch 2048, the bench geometry) per
precision, with proper device_sync warmup at the timed shapes (CLAUDE.md:
block_until_ready is a no-op on the axon tunnel). Also reports the loss
gap after the block so a precision regression is visible, not silent.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def run(matmul_dtype: str, steps: int = 200, n: int = 3000):
    import jax.numpy as jnp
    import jax.random as jrandom
    from pangaea_tpu.config import ModelConfig
    from pangaea_tpu.model import VAE, VAETrainer
    from pangaea_tpu.model.vae import init_vae
    from pangaea_tpu.utils import device_sync

    rng = np.random.RandomState(0)
    abd = rng.rand(n, 400).astype(np.float32)
    tnf = rng.rand(n, 136).astype(np.float32)
    model = VAE(abd_dim=400, tnf_dim=136, matmul_dtype=matmul_dtype)
    trainer = VAETrainer(model, ModelConfig(batch_size=2048))
    params, bn = init_vae(jrandom.PRNGKey(0), model)
    opt = trainer.tx.init(params)
    abd_d, tnf_d = jnp.asarray(abd), jnp.asarray(tnf)
    idx = rng.randint(0, n, (steps, 2048)).astype(np.int32)
    mask = np.ones(idx.shape + (1,), np.float32)
    idx_d, mask_d = jnp.asarray(idx), jnp.asarray(mask)
    key = jrandom.PRNGKey(1)
    p2, o2, b2, k2, stats = trainer._train_block(
        params, opt, bn, key, abd_d, tnf_d, idx_d, mask_d)
    device_sync(stats)
    t0 = time.time()
    p2, o2, b2, k2, stats = trainer._train_block(
        p2, o2, b2, k2, abd_d, tnf_d, idx_d, mask_d)
    device_sync(stats)
    dt = time.time() - t0
    return dt, float(np.asarray(stats)[0])


def main():
    t32, l32 = run("float32")
    tbf, lbf = run("bfloat16")
    print(f"fp32  {t32*1e3:8.1f} ms  loss {l32:.6f}")
    print(f"bf16  {tbf*1e3:8.1f} ms  loss {lbf:.6f}")
    print(f"speedup {t32/tbf:.2f}x  loss gap {abs(l32-lbf):.6f}")


if __name__ == "__main__":
    main()
