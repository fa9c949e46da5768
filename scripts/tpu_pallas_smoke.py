"""Compile + run the Pallas rasterizer on the real TPU, compare vs XLA path.

Run directly (no env overrides) so the axon TPU backend is used.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from gsl_tpu.ops.projection import project_gaussians
    from gsl_tpu.ops.rasterize_pallas import (isect_encode_padded,
                                              rasterize_pallas)
    from gsl_tpu.ops.tiling import isect_encode
    from gsl_tpu.ops.rasterize_jax import rasterize_tiles

    print("devices:", jax.devices())
    W, H, TS, CHUNK = 128, 128, 16, 128

    rng = np.random.RandomState(0)
    n = 2000
    means = np.concatenate([
        rng.uniform(-1, 1, size=(n, 2)),
        rng.uniform(2, 6, size=(n, 1))], axis=-1).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)

    w2c = jnp.eye(4)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), w2c,
        100.0, 100.0, W / 2, H / 2, W, H)

    t0 = time.time()
    isects = isect_encode_padded(proj, H, W, TS, capacity=1 << 15,
                                 chunk=CHUNK)
    jax.block_until_ready(isects.padded_ids)
    print(f"isect_encode_padded: {time.time()-t0:.1f}s, "
          f"n_isects={int(isects.n_isects)}")

    @jax.jit
    def run_pallas(m2, con, op, col):
        img, alpha = rasterize_pallas(m2, con, op, col, jnp.zeros_like(m2),
                                      isects, H, W, TS, CHUNK, False)
        return img, alpha

    t0 = time.time()
    img_p, alpha_p = run_pallas(proj.means2d, proj.conics,
                                jnp.asarray(opac), jnp.asarray(colors))
    jax.block_until_ready(img_p)
    print(f"pallas fwd compile+run: {time.time()-t0:.1f}s")

    isects2 = isect_encode(proj, H, W, TS, capacity=1 << 15)
    img_j, alpha_j = rasterize_tiles(
        proj.means2d, proj.conics, jnp.asarray(opac), jnp.asarray(colors),
        isects2, H, W, tile_size=TS, max_per_tile=2048, chunk=64)
    err = float(jnp.max(jnp.abs(img_p - img_j)))
    err_a = float(jnp.max(jnp.abs(alpha_p - alpha_j)))
    print(f"max |pallas - xla| img={err:.2e} alpha={err_a:.2e}")

    # backward compile check
    @jax.jit
    def g(m2, con, op, col):
        def loss(m2, con, op, col):
            img, alpha = rasterize_pallas(m2, con, op, col, jnp.zeros_like(m2),
                                          isects, H, W, TS, CHUNK, False)
            return jnp.sum(img ** 2) + jnp.sum(alpha ** 2)
        return jax.grad(loss, argnums=(0, 1, 2, 3))(m2, con, op, col)

    t0 = time.time()
    grads = g(proj.means2d, proj.conics, jnp.asarray(opac),
              jnp.asarray(colors))
    jax.block_until_ready(grads)
    print(f"pallas bwd compile+run: {time.time()-t0:.1f}s")
    print("grad norms:", [float(jnp.linalg.norm(x)) for x in grads])
    # both TPU paths carry matmul-precision noise; interpret-mode CPU tests
    # hold the tight 1e-4 parity bound
    assert err < 1e-2 and err_a < 1e-2
    print("TPU PALLAS SMOKE OK")


if __name__ == "__main__":
    main()
