"""Pinhole camera with radial-tangential distortion (jnp, batched).

Covers the reference's camera model: Config Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3,bf}
(/root/reference/src/Config.h:61-100), keypoint undistortion
(/root/reference/src/Frame.cc:335-365, cv::undistortPoints) and the
virtual-right-coordinate RGB-D convention mvuRight = u - bf/d
(/root/reference/src/Frame.cc:399-417).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Static pinhole intrinsics. All fields python floats/ints (hashable, so
    a CameraModel can be a jit static arg)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0  # baseline * fx, for RGB-D virtual right coord
    fps: float = 30.0

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def scaled(self, s: float) -> "CameraModel":
        """Intrinsics for a pyramid level scaled by factor s (<1 shrinks)."""
        return self._replace(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
            width=int(round(self.width * s)),
            height=int(round(self.height * s)),
            bf=self.bf * s,
        )


def distort_normalized(cam: CameraModel, xn):
    """Apply radial-tangential distortion to normalized coords xn [...,2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy = x * y
    dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
    dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
    return jnp.stack([x * radial + dx, y * radial + dy], axis=-1)


def undistort_normalized(cam: CameraModel, xd, iters: int = 8):
    """Invert distortion by fixed-point iteration (cv::undistortPoints style)."""
    if not cam.has_distortion:
        return xd

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        xy = x * y
        dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
        return jnp.stack(
            [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
        )

    return jax.lax.fori_loop(0, iters, body, xd)


def project(cam: CameraModel, Xc, distort: bool = False):
    """Camera-frame points [...,3] -> pixel uv [...,2] and depth [...].

    Safe for z <= 0 (clamped); callers must mask with the returned depth.
    """
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    xn = Xc[..., :2] / zs[..., None]
    if distort and cam.has_distortion:
        xn = distort_normalized(cam, xn)
    uv = jnp.stack(
        [cam.fx * xn[..., 0] + cam.cx, cam.fy * xn[..., 1] + cam.cy], axis=-1
    )
    return uv, z


def backproject(cam: CameraModel, uv, depth, undistort: bool = False):
    """Pixels [...,2] + depth [...] -> camera-frame 3D points [...,3]."""
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    if undistort:
        xn = undistort_normalized(cam, xn)
    return jnp.concatenate([xn * depth[..., None], depth[..., None]], axis=-1)


def undistort_pixels(cam: CameraModel, uv):
    """Distorted pixels -> undistorted pixels (same K re-projection).

    Mirrors Frame::UndistortKeyPoints (/root/reference/src/Frame.cc:335-365).
    """
    if not cam.has_distortion:
        return uv
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    xu = undistort_normalized(cam, xn)
    return jnp.stack(
        [cam.fx * xu[..., 0] + cam.cx, cam.fy * xu[..., 1] + cam.cy], axis=-1
    )


def in_image(cam: CameraModel, uv, border: float = 0.0):
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border)
        & (u < cam.width - border)
        & (v >= border)
        & (v < cam.height - border)
    )


def project_jacobian(cam: CameraModel, Xc):
    """d(uv)/d(Xc) for the undistorted pinhole model: [...,2,3]."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([cam.fx * zi, zero, -cam.fx * x * zi2], axis=-1)
    row1 = jnp.stack([zero, cam.fy * zi, -cam.fy * y * zi2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def virtual_right(cam: CameraModel, u, depth):
    """RGB-D virtual right coordinate: u - bf/d (Frame.cc:414); -1 if no depth."""
    ok = depth > 0
    d = jnp.where(ok, depth, 1.0)
    return jnp.where(ok, u - cam.bf / d, -1.0)
