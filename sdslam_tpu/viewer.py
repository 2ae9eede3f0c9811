"""Lightweight visualization + AR plane fitting.

Replaces the reference's Pangolin UI stack (src/ui/{Viewer,FrameDrawer,
MapDrawer,Plane}) with headless renders: the map/trajectory view and the
frame overlay are drawn with matplotlib into PNG files (or returned as
arrays), which suits TPU pods where no GL display exists.  The AR plane RANSAC
(FrameDrawer::DetectPlane, Plane.cc:52-58) is a small numpy routine.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from sdslam_tpu.mapping import map_state as M
from sdslam_tpu.utils import metrics


def draw_map(
    ms: M.MapState,
    trajectory=None,
    path: Optional[str] = None,
    show_covisibility: bool = True,
    covis_min: int = 15,
):
    """Top-down (x-z) map view: points, keyframe frusta positions, trajectory,
    covisibility edges (MapDrawer::DrawMapPoints/DrawKeyFrames)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    pts = np.asarray(ms.pt_pos)[np.asarray(ms.pt_valid)]
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=1, c="#333333", label="map points")
    kf_mask = np.asarray(ms.kf_valid)
    centers = metrics.camera_centers(np.asarray(ms.kf_Tcw))[kf_mask]
    if len(centers):
        ax.scatter(centers[:, 0], centers[:, 2], s=40, marker="s",
                   c="#1f77b4", label="keyframes")
    if show_covisibility and kf_mask.sum() > 1:
        cov = np.asarray(M.covisibility(ms))
        idx = np.flatnonzero(kf_mask)
        for a in idx:
            for b in idx:
                if b > a and cov[a, b] >= covis_min:
                    ca = metrics.camera_centers(np.asarray(ms.kf_Tcw[a : a + 1]))[0]
                    cb = metrics.camera_centers(np.asarray(ms.kf_Tcw[b : b + 1]))[0]
                    ax.plot([ca[0], cb[0]], [ca[2], cb[2]], c="#aec7e8", lw=0.5)
    if trajectory is not None and len(trajectory):
        c = metrics.camera_centers(np.asarray(trajectory))
        ax.plot(c[:, 0], c[:, 2], c="#2ca02c", lw=1.5, label="trajectory")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_aspect("equal")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    fig.canvas.draw()
    arr = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return arr


def draw_frame(
    img,
    uv,
    matched_mask=None,
    state_text: str = "",
    path: Optional[str] = None,
):
    """Current frame with keypoint overlay (FrameDrawer::DrawFrame)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    uv = np.asarray(uv)
    if matched_mask is not None:
        mm = np.asarray(matched_mask)
        ax.scatter(uv[~mm, 0], uv[~mm, 1], s=6, c="#d62728", marker="x")
        ax.scatter(uv[mm, 0], uv[mm, 1], s=8, facecolors="none",
                   edgecolors="#2ca02c")
    else:
        ax.scatter(uv[:, 0], uv[:, 1], s=6, c="#2ca02c", marker="o")
    if state_text:
        ax.set_title(state_text, fontsize=10)
    ax.axis("off")
    if path:
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return path
    fig.canvas.draw()
    arr = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return arr


def detect_plane(points: np.ndarray, n_iters: int = 200, th: float = 0.02, seed: int = 0):
    """RANSAC plane fit over tracked map points for AR placement
    (FrameDrawer::DetectPlane / Plane). Returns (normal, d, inlier_mask) with
    plane n.x = d, or None if unsupported."""
    pts = np.asarray(points, np.float64)
    if len(pts) < 3:
        return None
    rng = np.random.default_rng(seed)
    best = (None, None, None, -1)
    for _ in range(n_iters):
        i = rng.choice(len(pts), 3, replace=False)
        a, b, c = pts[i]
        n = np.cross(b - a, c - a)
        nn = np.linalg.norm(n)
        if nn < 1e-9:
            continue
        n = n / nn
        d = float(n @ a)
        dist = np.abs(pts @ n - d)
        inl = dist < th
        if inl.sum() > best[3]:
            best = (n, d, inl, int(inl.sum()))
    n, d, inl, cnt = best
    if n is None or cnt < max(10, 0.2 * len(pts)):
        return None
    # refine with least squares on inliers
    P = pts[inl]
    centroid = P.mean(0)
    _, _, Vt = np.linalg.svd(P - centroid)
    n = Vt[2]
    d = float(n @ centroid)
    dist = np.abs(pts @ n - d)
    return n.astype(np.float32), d, dist < th
