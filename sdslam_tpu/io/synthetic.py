"""Synthetic photometric RGB-D scene renderer (test bed + benchmark workload).

The reference validates only against TUM/EuRoC datasets it cannot ship
(/root/reference/README.md:47-58); this module provides a fully controlled
substitute: a planar "room" with a smooth procedural texture, rendered
analytically for any camera pose, with exact depth and exact trajectory
ground truth.  Photometric consistency across views is exact, which makes it
a valid workload for the direct image-alignment path (ImageAlign) and yields
ATE ~ 0 expectations for integration tests (SURVEY.md §4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel


class PlaneScene(NamedTuple):
    """A set of textured planes n·x = d with rectangular bounds."""

    normals: jnp.ndarray  # [P,3]
    offsets: jnp.ndarray  # [P]
    # texture basis, shared across planes: I = bias_p + sum_k amp * sin(f·x + ph)
    freqs: jnp.ndarray  # [K,3]
    phases: jnp.ndarray  # [K]
    amps: jnp.ndarray  # [K]
    biases: jnp.ndarray  # [P]


def make_room_scene(seed: int = 0, n_waves: int = 48, size: float = 4.0) -> PlaneScene:
    """Room around the origin; camera conventions: x right, y down, z forward."""
    rng = np.random.default_rng(seed)
    normals = np.array(
        [
            [0.0, 0.0, -1.0],  # back wall at z = size
            [1.0, 0.0, 0.0],  # left wall at x = -size/2
            [-1.0, 0.0, 0.0],  # right wall at x = +size/2
            [0.0, -1.0, 0.0],  # floor at y = +size/3 (y down)
            [0.0, 1.0, 0.0],  # ceiling at y = -size/3
        ],
        dtype=np.float32,
    )
    offsets = np.array([-size, -size / 2, -size / 2, -size / 3, -size / 3], np.float32)
    # Two-band texture: low frequencies give smooth photometric structure for
    # direct alignment; a mid-high band (up to ~110 rad/m, safely below the
    # ~250 rad/m pixel Nyquist at 4 m / fx=320) creates FAST-detectable
    # corners at level 0.
    dirs = rng.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    n_low = n_waves // 4
    mags = np.concatenate(
        [
            rng.uniform(1.0, 14.0, size=(n_low, 1)),
            rng.uniform(15.0, 110.0, size=(n_waves - n_low, 1)),
        ]
    )
    freqs = (dirs * mags).astype(np.float32)
    phases = rng.uniform(0, 2 * np.pi, size=n_waves).astype(np.float32)
    amps = (rng.uniform(0.3, 1.0, size=n_waves) / np.sqrt(n_waves)).astype(np.float32)
    biases = rng.uniform(0.35, 0.65, size=len(normals)).astype(np.float32)
    return PlaneScene(
        jnp.asarray(normals),
        jnp.asarray(offsets),
        jnp.asarray(freqs),
        jnp.asarray(phases),
        jnp.asarray(amps),
        jnp.asarray(biases),
    )


def scene_intensity(scene: PlaneScene, X, plane_idx):
    """Procedural texture value in [0,1]-ish at world points X [...,3]."""
    phase = jnp.einsum("...i,ki->...k", X, scene.freqs) + scene.phases
    tex = jnp.einsum("...k,k->...", jnp.sin(phase), scene.amps)
    # soft contrast sharpening: strengthens gradients/corners while keeping
    # the intensity field analytic (no aliasing from hard edges)
    return scene.biases[plane_idx] + 0.45 * jnp.tanh(2.2 * tex)


@functools.partial(jax.jit, static_argnames=("cam",))
def render(scene: PlaneScene, cam: CameraModel, Tcw):
    """Render grayscale image [H,W] float32 in [0,255] and depth [H,W] (m)."""
    H, W = cam.height, cam.width
    Twc = lie.se3_inv(Tcw)
    Rwc, twc = lie.se3_R(Twc), lie.se3_t(Twc)

    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    # unnormalized camera-ray with z=1 so the ray parameter equals depth
    dc = jnp.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)], -1)
    dw = jnp.einsum("ij,hwj->hwi", Rwc, dc)  # [H,W,3]

    n_dot_o = jnp.einsum("pi,i->p", scene.normals, twc)  # [P]
    n_dot_d = jnp.einsum("pi,hwi->hwp", scene.normals, dw)  # [H,W,P]
    t = (scene.offsets[None, None, :] - n_dot_o[None, None, :]) / jnp.where(
        jnp.abs(n_dot_d) < 1e-6, 1e-6, n_dot_d
    )
    t = jnp.where(t > 1e-3, t, jnp.inf)
    plane_idx = jnp.argmin(t, axis=-1)  # [H,W]
    depth = jnp.min(t, axis=-1)
    Xw = twc[None, None, :] + depth[..., None] * dw
    img = scene_intensity(scene, Xw, plane_idx) * 255.0
    img = jnp.clip(img, 0.0, 255.0)
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return img, depth


def orbit_trajectory(n_frames: int, radius: float = 0.4, seed: int = 1):
    """Smooth looping trajectory of Tcw poses [N,4,4] looking down +z.

    Small rotations + translation loop; starts at identity.
    """
    ts = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    poses = []
    for t in ts:
        # camera center in world coordinates
        c = np.array(
            [radius * np.sin(t), 0.25 * radius * np.sin(2 * t), 0.3 * radius * (1 - np.cos(t))],
            np.float32,
        )
        yaw = 0.12 * np.sin(t)
        pitch = 0.06 * np.sin(2 * t)
        phi = np.array([pitch, yaw, 0.0], np.float32)
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        Rcw = Rwc.T
        tcw = -Rcw @ c
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = tcw
        poses.append(T)
    return jnp.asarray(np.stack(poses))


def forward_trajectory(n_frames: int, step: float = 0.02, yaw_rate: float = 0.0):
    """Straight-ish dolly forward, constant velocity (EKF-friendly)."""
    poses = []
    for i in range(n_frames):
        c = np.array([0.0, 0.0, step * i], np.float32)
        phi = np.array([0.0, yaw_rate * i, 0.0], np.float32)
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        Rcw = Rwc.T
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = -Rcw @ c
        poses.append(T)
    return jnp.asarray(np.stack(poses))


class SyntheticSequence:
    """Dataset-like iterable of (timestamp, image, depth) with GT poses."""

    def __init__(
        self,
        cam: CameraModel,
        n_frames: int = 60,
        trajectory: str = "orbit",
        seed: int = 0,
        fps: float = 30.0,
        **traj_kwargs,
    ):
        self.cam = cam
        self.scene = make_room_scene(seed=seed)
        if trajectory == "orbit":
            self.poses = orbit_trajectory(n_frames, **traj_kwargs)
        elif trajectory == "forward":
            self.poses = forward_trajectory(n_frames, **traj_kwargs)
        else:
            raise ValueError(trajectory)
        self.timestamps = np.arange(n_frames) / fps

    def __len__(self):
        return len(self.timestamps)

    def frame(self, i: int):
        img, depth = render(self.scene, self.cam, self.poses[i])
        return self.timestamps[i], img, depth

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)
