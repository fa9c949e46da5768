"""Camera container (SoA pytree), TPU-native analogue of the reference
`Cameras`/`Camera` dataclasses (/root/reference/internal/cameras/cameras.py:13-205).

Differences from the reference (by design):
- plain flax.struct pytree of arrays — jit/vmap/shard-friendly; no torch
  buffers, no transposed-matrix convention. ``p_cam = R @ p_world + T``
  (column-vector convention) everywhere.
- image width/height live in the pytree for bookkeeping, but renderers take
  static (H, W) python ints — XLA needs static output shapes.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Cameras:
    """Batched (or single, if unbatched arrays) camera parameters.

    R: [..., 3, 3] world-to-camera rotation
    T: [..., 3]    world-to-camera translation
    fx, fy, cx, cy: [...] intrinsics (pixels)
    width, height:  [...] int32
    appearance_id:  [...] int32 (per-image appearance group)
    time:           [...] float32 (dynamic scenes; 0 for static)
    """

    R: jnp.ndarray
    T: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    appearance_id: jnp.ndarray
    time: jnp.ndarray

    def __len__(self) -> int:
        return int(np.shape(self.fx)[0])

    def __getitem__(self, idx) -> "Cameras":
        return Cameras(
            R=self.R[idx], T=self.T[idx], fx=self.fx[idx], fy=self.fy[idx],
            cx=self.cx[idx], cy=self.cy[idx], width=self.width[idx],
            height=self.height[idx], appearance_id=self.appearance_id[idx],
            time=self.time[idx],
        )

    @property
    def world_to_camera(self) -> jnp.ndarray:
        """[..., 4, 4] such that p_cam = (w2c @ [p, 1])[:3]."""
        bot = jnp.zeros_like(self.R[..., :1, :])
        top = jnp.concatenate([self.R, self.T[..., :, None]], axis=-1)
        bot = jnp.concatenate(
            [bot, jnp.ones_like(self.T[..., :1, None])], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    @property
    def camera_center(self) -> jnp.ndarray:
        """[..., 3] camera position in world space: -R^T T."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.T)

    @property
    def fov_x(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan2(self.width.astype(self.fx.dtype) / 2.0, self.fx)

    @property
    def fov_y(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan2(self.height.astype(self.fy.dtype) / 2.0, self.fy)

    def get_K(self) -> jnp.ndarray:
        """[..., 3, 3] intrinsics matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], axis=-1),
            jnp.stack([z, self.fy, self.cy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ], axis=-2)

    def rescale(self, factor: float) -> "Cameras":
        """Downscale image size + intrinsics by 1/factor
        (reference cameras.py `rescale` semantics)."""
        return self.replace(
            fx=self.fx / factor, fy=self.fy / factor,
            cx=self.cx / factor, cy=self.cy / factor,
            width=(self.width / factor).astype(jnp.int32),
            height=(self.height / factor).astype(jnp.int32),
        )


def make_camera(R, T, fx, fy, cx, cy, width, height,
                appearance_id=0, time=0.0, dtype=jnp.float32) -> Cameras:
    """Build a single (unbatched) Cameras pytree from scalars/arrays."""
    return Cameras(
        R=jnp.asarray(R, dtype), T=jnp.asarray(T, dtype),
        fx=jnp.asarray(fx, dtype), fy=jnp.asarray(fy, dtype),
        cx=jnp.asarray(cx, dtype), cy=jnp.asarray(cy, dtype),
        width=jnp.asarray(width, jnp.int32),
        height=jnp.asarray(height, jnp.int32),
        appearance_id=jnp.asarray(appearance_id, jnp.int32),
        time=jnp.asarray(time, dtype),
    )


def stack_cameras(cams: list) -> Cameras:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *cams)
