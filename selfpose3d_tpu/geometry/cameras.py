"""Pinhole camera model with radial/tangential distortion, pure jnp.

Replaces the reference's torch camera model (ref: lib/utils/cameras.py:27-151
and its numpy twin lib/utils/cameras_cpu.py). Unlike the reference — which
loops over the batch in python (``project_point_radial_batch``, ref:
lib/utils/cameras.py:58-108) — every function here is written point-wise
vectorized so arbitrary leading axes (batch, views, persons) broadcast or
``vmap`` away. All shapes are static; everything is jit-safe on TPU.

Conventions (identical to the reference):
  x_cam = R @ (x_world^T - T)           R: (3,3), T: (3,1), world units mm
  y     = x_cam[:2] / (x_cam[2] + 1e-5)
  radial:  1 + k1 r^2 + k2 r^4 + k3 r^6
  tangent: 2*(p0*y1 + p1*y0); additive term [p1, p0] * r^2
  pix   = f * y_distorted + c
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CameraParams:
    """Batched camera parameters as a pytree (struct-of-arrays).

    All fields carry matching leading axes, e.g. (V,) or (B, V):
      R: (..., 3, 3)   rotation world->camera
      T: (..., 3, 1)   camera position in world coords (reference convention)
      f: (..., 2)      focal lengths (fx, fy)
      c: (..., 2)      principal point (cx, cy)
      k: (..., 3)      radial distortion k1, k2, k3
      p: (..., 2)      tangential distortion p1, p2
    """

    R: jnp.ndarray
    T: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    k: jnp.ndarray
    p: jnp.ndarray

    @property
    def batch_shape(self):
        return self.R.shape[:-2]

    @classmethod
    def from_dict(cls, d) -> "CameraParams":
        """Build from the reference's camera dict {R,T,fx,fy,cx,cy,k,p}."""
        import numpy as np

        R = jnp.asarray(np.asarray(d["R"], dtype=np.float32))
        T = jnp.asarray(np.asarray(d["T"], dtype=np.float32)).reshape(R.shape[:-2] + (3, 1))
        fx = np.asarray(d["fx"], dtype=np.float32)
        fy = np.asarray(d["fy"], dtype=np.float32)
        f = jnp.stack([jnp.asarray(fx), jnp.asarray(fy)], axis=-1).reshape(R.shape[:-2] + (2,))
        cx = np.asarray(d["cx"], dtype=np.float32)
        cy = np.asarray(d["cy"], dtype=np.float32)
        c = jnp.stack([jnp.asarray(cx), jnp.asarray(cy)], axis=-1).reshape(R.shape[:-2] + (2,))
        k = jnp.asarray(np.asarray(d["k"], dtype=np.float32)).reshape(R.shape[:-2] + (3,))
        p = jnp.asarray(np.asarray(d["p"], dtype=np.float32)).reshape(R.shape[:-2] + (2,))
        return cls(R=R, T=T, f=f, c=c, k=k, p=p)


def _project_core(x, R, T, f, c, k, p):
    """Project (..., N, 3) world points with (...)-batched camera params."""
    # world -> camera: (..., N, 3) = (x - T^T) @ R^T
    xcam = jnp.einsum("...ij,...nj->...ni", R, x - jnp.swapaxes(T, -1, -2))
    y = xcam[..., :2] / (xcam[..., 2:3] + 1e-5)

    r2 = jnp.sum(y * y, axis=-1)  # (..., N)
    r2 = jnp.clip(r2, max=1e10)
    radial = (
        1.0
        + k[..., 0:1] * r2
        + k[..., 1:2] * r2 * r2
        + k[..., 2:3] * r2 * r2 * r2
    )  # (..., N)
    tan = p[..., 0:1] * y[..., 1] + p[..., 1:2] * y[..., 0]  # (..., N)
    corr = (radial + 2.0 * tan)[..., None]  # (..., N, 1)

    # additive tangential term: [p1, p0] * r^2  (reference's torch.ger term)
    p_swap = jnp.stack([p[..., 1], p[..., 0]], axis=-1)  # (..., 2)
    y = y * corr + p_swap[..., None, :] * r2[..., None]
    return f[..., None, :] * y + c[..., None, :]


def project_points(x: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """World points (..., N, 3) -> pixel coords (..., N, 2).

    Matches ``project_point_radial`` (ref: lib/utils/cameras.py:27-55) but
    broadcasts over any shared leading axes between ``x`` and ``cam``.
    """
    return _project_core(x, cam.R, cam.T, cam.f, cam.c, cam.k, cam.p)


def project_points_with_trans(
    x: jnp.ndarray, cam: CameraParams, trans: jnp.ndarray
) -> jnp.ndarray:
    """Project then apply an image-space affine transform in homogeneous coords.

    This is the differentiable 3D->2D op inside the SSV cross-augmentation loss
    (ref: lib/utils/cameras.py:58-108 ``project_point_radial_batch``).

    Args:
      x:     (..., N, 3) world points.
      cam:   camera params with leading axes broadcastable against x.
      trans: (..., 2, 3) or (..., 3, 3) affine matrix mapping original-image
             pixels to augmented-image pixels.
    Returns:
      (..., N, 2) transformed pixel coordinates.
    """
    pix = project_points(x, cam)  # (..., N, 2)
    A = trans[..., :2, :2]  # (..., 2, 2)
    b = trans[..., :2, 2]  # (..., 2)
    return jnp.einsum("...ij,...nj->...ni", A, pix) + b[..., None, :]


def world_to_camera_frame(x: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) world -> camera (ref: lib/utils/cameras.py:121-134)."""
    return jnp.einsum("...ij,...nj->...ni", R, x - jnp.swapaxes(T, -1, -2))


def camera_to_world_frame(x: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) camera -> world (ref: lib/utils/cameras.py:137-151)."""
    return jnp.einsum("...ji,...nj->...ni", R, x) + jnp.swapaxes(T, -1, -2)
