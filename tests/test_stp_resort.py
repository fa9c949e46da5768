"""StopThePop per-pixel windowed resort: forward + gradient parity against
a dense differentiable oracle (reference internal/renderers/
stp_renderer.py:1-154 — hierarchical per-pixel depth resorting)."""
import jax
import jax.numpy as jnp
import numpy as np

from gsl_tpu.ops.projection import Projections
from gsl_tpu.ops.rasterize_pallas import (STP_WINDOW, isect_encode_padded,
                                          rasterize_pallas)
from gsl_tpu.ops.rasterize_reference import ALPHA_THRESHOLD, MAX_ALPHA

TS = 16
H = W = 16  # single tile: stream windows align with the tile start


def _make_scene(n, seed=0):
    rng = np.random.RandomState(seed)
    means2d = jnp.asarray(rng.rand(n, 2) * 14 + 1, jnp.float32)
    conics = jnp.asarray(
        np.stack([rng.rand(n) * 0.15 + 0.03,
                  (rng.rand(n) - 0.5) * 0.02,
                  rng.rand(n) * 0.15 + 0.03], -1), jnp.float32)
    opac = jnp.asarray(rng.rand(n) * 0.6 + 0.2, jnp.float32)
    colors = jnp.asarray(rng.rand(n, 3), jnp.float32)
    depths = jnp.asarray(rng.rand(n) * 3 + 1, jnp.float32)
    kz = jnp.asarray((rng.rand(n, 2) - 0.5) * 0.6, jnp.float32)
    return means2d, conics, opac, colors, depths, kz


def _stream_order(depths, kz, means2d, n_tiles=1):
    """Replicate the kernel's sort order for a single tile: quantized
    (tile-center plane depth) key, ties by gaussian index (stable)."""
    depth_bits = 32 - max(int(np.ceil(np.log2(n_tiles + 1))), 1)
    tc = np.asarray([TS / 2.0, TS / 2.0], np.float32)
    d_tc = (np.asarray(depths) + np.asarray(kz[:, 0]) * (tc[0]
            - np.asarray(means2d[:, 0]))
            + np.asarray(kz[:, 1]) * (tc[1] - np.asarray(means2d[:, 1])))
    dbits = np.maximum(d_tc, 0.0).astype(np.float32).view(np.uint32)
    key = dbits >> np.uint32(32 - depth_bits)
    return np.argsort(key, kind="stable")


def _oracle_stp(means2d, conics, opac, colors, depths, kz, order):
    """Differentiable dense compositor with per-pixel resort inside
    aligned STP_WINDOW groups of the sorted stream; no transmittance
    break (kernel stp semantics). Ordering is stop-gradient."""
    means2d = means2d[order]
    conics = conics[order]
    opac = opac[order]
    colors = colors[order]
    depths = depths[order]
    kz = kz[order]
    S = means2d.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    px = xs.reshape(-1).astype(jnp.float32) + 0.5        # [P]
    py = ys.reshape(-1).astype(jnp.float32) + 0.5
    dx = means2d[None, :, 0] - px[:, None]               # [P, S]
    dy = means2d[None, :, 1] - py[:, None]
    sigma = (0.5 * (conics[None, :, 0] * dx * dx
                    + conics[None, :, 2] * dy * dy)
             + conics[None, :, 1] * dx * dy)
    raw = opac[None, :] * jnp.exp(-sigma)
    alpha = jnp.minimum(MAX_ALPHA, raw)
    keep = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD)
    a = jnp.where(keep, alpha, 0.0)                      # [P, S]

    d_p = (depths[None, :] + kz[None, :, 0] * (px[:, None]
           - means2d[None, :, 0])
           + kz[None, :, 1] * (py[:, None] - means2d[None, :, 1]))
    # per-pixel rank inside each aligned window; stable tie-break by slot
    d_key = jax.lax.stop_gradient(d_p)
    perms = []
    for wstart in range(0, S, STP_WINDOW):
        sl = slice(wstart, min(wstart + STP_WINDOW, S))
        perms.append(jnp.argsort(d_key[:, sl], axis=1, stable=True)
                     + wstart)
    perm = jnp.concatenate(perms, axis=1)                # [P, S]
    a_o = jnp.take_along_axis(a, perm, axis=1)
    col_o = colors[perm]                                 # [P, S, 3]
    T_exc = jnp.cumprod(1.0 - a_o, axis=1) / (1.0 - a_o)
    w = a_o * T_exc                                      # [P, S]
    img = jnp.sum(w[..., None] * col_o, axis=1).reshape(H, W, 3)
    alpha_img = (1.0 - jnp.prod(1.0 - a_o, axis=1)).reshape(H, W)
    return img, alpha_img


def _pallas_stp(means2d, conics, opac, colors, depths, kz):
    proj = Projections(
        means2d=means2d, depths=depths,
        radii=jnp.full((means2d.shape[0],), 8, jnp.int32), conics=conics,
        compensations=jnp.ones(means2d.shape[0]),
        mask=jnp.ones(means2d.shape[0], bool), depth_grads=kz)
    isects = isect_encode_padded(proj, H, W, TS, capacity=1024)
    img, alpha = rasterize_pallas(
        means2d, conics, opac, colors, jnp.zeros_like(means2d), isects,
        H, W, TS, 128, True, 1024, False, False, True)
    return img, alpha


def test_stp_fwd_matches_windowed_oracle_multiwindow():
    """40 gaussians in one tile -> 3 stream windows; per-pixel order is
    exact within windows, key order across them."""
    scene = _make_scene(40, seed=3)
    order = _stream_order(scene[4], scene[5], scene[0])
    img, alpha = _pallas_stp(*scene)
    img_o, alpha_o = _oracle_stp(*scene, order)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_o),
                               rtol=1e-4, atol=1e-5)


def test_stp_bwd_matches_windowed_oracle():
    """Gradients through the resorted compositing match the dense oracle
    (ordering is stop-grad in both)."""
    scene = _make_scene(24, seed=7)
    order = _stream_order(scene[4], scene[5], scene[0])
    wr = jnp.asarray(np.random.RandomState(1).rand(H, W, 3), jnp.float32)
    wa = jnp.asarray(np.random.RandomState(2).rand(H, W), jnp.float32)

    def loss_pallas(m, c, o, ch):
        img, alpha = _pallas_stp(m, c, o, ch, scene[4], scene[5])
        return jnp.sum(img * wr) + jnp.sum(alpha * wa)

    def loss_oracle(m, c, o, ch):
        img, alpha = _oracle_stp(m, c, o, ch, scene[4], scene[5], order)
        return jnp.sum(img * wr) + jnp.sum(alpha * wa)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*scene[:4])
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(*scene[:4])
    for a, b in zip(gp, go):
        denom = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a) / denom,
                                   np.asarray(b) / denom, atol=2e-3)


def test_stp_bwd_fast_mode_matches_oracle():
    """FAST+stp gradient parity (regression: round-4 commit 5363c66 made
    the fast backward's moment recombination read geom means as
    tile-center-relative, but the stp expand layout keeps ABSOLUTE f32
    means — every fast+stp mean/conic gradient was recombined in the
    wrong frame, and no test ran the fast+stp backward)."""
    scene = _make_scene(24, seed=7)
    wr = jnp.asarray(np.random.RandomState(1).rand(H, W, 3), jnp.float32)
    wa = jnp.asarray(np.random.RandomState(2).rand(H, W), jnp.float32)

    def loss(fast, m, c, o, ch):
        proj = Projections(
            means2d=m, depths=scene[4],
            radii=jnp.full((m.shape[0],), 8, jnp.int32), conics=c,
            compensations=jnp.ones(m.shape[0]),
            mask=jnp.ones(m.shape[0], bool), depth_grads=scene[5])
        isects = isect_encode_padded(proj, H, W, TS, capacity=1024)
        img, alpha = rasterize_pallas(
            m, c, o, ch, jnp.zeros_like(m), isects, H, W, TS, 128, True,
            1024, False, fast, True)
        return jnp.sum(img * wr) + jnp.sum(alpha * wa)

    ge = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1))(*scene[:4])
    gf = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1))(*scene[:4])
    for a, b in zip(ge, gf):
        denom = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / denom,
                                   np.asarray(a) / denom, atol=0.03)


def test_stp_trivial_ordering_matches_plain():
    """With kz = 0 and no transmittance saturation, the per-pixel order
    equals the key order and STP must reproduce the plain renderer."""
    scene = list(_make_scene(12, seed=11))
    scene[5] = jnp.zeros_like(scene[5])                  # kz = 0
    scene[2] = scene[2] * 0.3                            # keep T > 1e-4
    img_stp, alpha_stp = _pallas_stp(*scene)

    proj = Projections(
        means2d=scene[0], depths=scene[4],
        radii=jnp.full((12,), 8, jnp.int32), conics=scene[1],
        compensations=jnp.ones(12), mask=jnp.ones(12, bool),
        depth_grads=scene[5])
    isects = isect_encode_padded(proj, H, W, TS, capacity=1024)
    img, alpha = rasterize_pallas(
        scene[0], scene[1], scene[2], scene[3],
        jnp.zeros_like(scene[0]), isects, H, W, TS, 128, True, 1024,
        False, False, False)
    np.testing.assert_allclose(np.asarray(img_stp), np.asarray(img),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha_stp), np.asarray(alpha),
                               rtol=1e-5, atol=1e-6)
