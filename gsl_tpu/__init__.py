"""gsl_tpu: TPU-native 3D Gaussian Splatting framework (JAX / Pallas / pjit).

A from-scratch re-design of the capability set of
yzslab/gaussian-splatting-lightning for TPU hardware:

- ``ops``       device kernels: EWA projection, tile binning, depth-sorted
                alpha compositing (pure-JAX reference + Pallas TPU kernels),
                spherical harmonics, SSIM, kNN.
- ``models``    GaussianState pytrees (vanilla, Mip-Splatting, 2DGS, ...).
- ``renderers`` renderer modules composing the ops into camera->image.
- ``training``  trainer, metrics, density controllers, optimizers, schedulers.
- ``data``      cameras, dataparsers (Colmap/Blender/...), data loading.
- ``parallel``  device-mesh sharding: camera DP + Gaussian-sharded MP.
- ``utils``     PLY I/O, checkpointing, partitioning, visualization.

Package name is the importable form of "gaussian-splatting-lightning_tpu".
"""

__version__ = "0.1.0"

# Platform escape hatch: the container's sitecustomize force-overwrites
# JAX_PLATFORMS at interpreter start (so exporting it to a subprocess is
# silently ignored). GSL_PLATFORM survives and wins here, before any jax
# computation initializes a backend — tests set it to "cpu" so tool
# subprocesses never touch (or hang on) the TPU tunnel.
import os as _os

if _os.environ.get("GSL_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GSL_PLATFORM"])
