"""Rigid/similarity transforms of Gaussian models, SH-preserving.

Parity with the reference GaussianTransformUtils
(/root/reference/internal/utils/gaussian_utils.py:257-427): rotate /
translate / scale a model including rotation of the spherical-harmonics
coefficients. SH rotation uses the Ivanic-Ruedenberg recurrence (the
standard real-SH Wigner construction) for bands 1..3, built in numpy
host-side and applied as per-band matmuls.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..data.colmap_io import rotmat_to_qvec
from ..models.gaussian import GaussianState


# ---------------- real-SH rotation ----------------

def sh_rotation_matrices(R: np.ndarray, max_degree: int = 3):
    """-> list of per-band matrices [3x3, 5x5, 7x7][:max_degree] rotating
    real-SH coefficient vectors in OUR basis ordering (ops/sh.py).

    Solved numerically per band from the exact linear relation
    B_j(R^-1 d) = sum_i B_i(d) M[i, j] — convention-proof against SH phase
    choices, exact to machine precision (the relation is linear and the
    sample system is vastly overdetermined)."""
    from ..ops.sh import sh_basis
    import jax.numpy as _jnp

    R = np.asarray(R, np.float64)
    rng = np.random.RandomState(12345)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    A = np.asarray(sh_basis(_jnp.asarray(d), max_degree), np.float64)
    Bm = np.asarray(sh_basis(_jnp.asarray(d @ R), max_degree), np.float64)

    mats = []
    start = 1
    for l in range(1, max_degree + 1):
        size = 2 * l + 1
        Ab = A[:, start:start + size]
        Bb = Bm[:, start:start + size]
        M, *_ = np.linalg.lstsq(Ab, Bb, rcond=None)
        mats.append(M)
        start += size
    return mats


def rotate_shs(shs_rest: jnp.ndarray, R: np.ndarray) -> jnp.ndarray:
    """shs_rest [N, K-1, 3] -> rotated (bands 1..3)."""
    k_rest = shs_rest.shape[1]
    max_degree = {0: 0, 3: 1, 8: 2, 15: 3}[k_rest]
    if max_degree == 0:
        return shs_rest
    mats = sh_rotation_matrices(R, max_degree)
    out = []
    start = 0
    for l, M in enumerate(mats, start=1):
        size = 2 * l + 1
        block = shs_rest[:, start:start + size, :]
        out.append(jnp.einsum("ij,njc->nic",
                              jnp.asarray(M, jnp.float32), block))
        start += size
    return jnp.concatenate(out, axis=1)


# ---------------- model transforms ----------------

def _quat_multiply(q1, q2):
    """wxyz hamilton product (batched q2)."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2[:, 0], q2[:, 1], q2[:, 2], q2[:, 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def rotate_state(state: GaussianState, R: np.ndarray) -> GaussianState:
    """means' = R @ means; quats' = q_R * q; SH rotated."""
    Rj = jnp.asarray(R, jnp.float32)
    qR = rotmat_to_qvec(np.asarray(R, np.float64))
    p = state.params
    params = p.replace(
        means=p.means @ Rj.T,
        rotations=_quat_multiply(tuple(float(x) for x in qR), p.rotations),
        shs_rest=rotate_shs(p.shs_rest, R),
    )
    return GaussianState(params=params, alive=state.alive,
                         extra=state.extra)


def translate_state(state: GaussianState, t) -> GaussianState:
    p = state.params
    return GaussianState(
        params=p.replace(means=p.means + jnp.asarray(t, jnp.float32)),
        alive=state.alive, extra=state.extra)


def scale_state(state: GaussianState, s: float) -> GaussianState:
    """uniform similarity scale about the origin."""
    p = state.params
    return GaussianState(
        params=p.replace(means=p.means * s,
                         scales=p.scales + jnp.log(s)),
        alive=state.alive, extra=state.extra)
