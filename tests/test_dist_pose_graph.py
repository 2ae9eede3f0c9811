"""Distributed Sim3 pose graph on the 8-device virtual CPU mesh: must match
the single-device optimizer and correct an injected loop-closure drift."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sdslam_tpu.geometry import lie
from sdslam_tpu.parallel.dist_pose_graph import distributed_pose_graph
from sdslam_tpu.solvers import pose_graph as pg


def _ring_problem(K=12, drift=0.05, seed=0):
    """A loop of K poses with accumulated drift; the loop edge carries the
    true (drift-free) relative transform, like a detected loop closure."""
    rng = np.random.default_rng(seed)
    S_gt = [np.eye(4, dtype=np.float32)]
    for k in range(1, K):
        xi = np.zeros(7, np.float32)
        xi[0] = 0.5
        xi[5] = 2 * np.pi / K
        S_gt.append(np.asarray(lie.sim3_exp(jnp.asarray(xi))) @ S_gt[-1])
    # drifted estimates: noise grows along the chain
    S_est = [S_gt[0]]
    for k in range(1, K):
        xi = rng.normal(size=7).astype(np.float32) * drift * k / K
        xi[6] = 0.0
        S_est.append(np.asarray(lie.sim3_exp(jnp.asarray(xi))) @ S_gt[k])
    S_est = jnp.asarray(np.stack(S_est))
    S_gt_a = jnp.asarray(np.stack(S_gt))

    # edges: consecutive chain (true relatives) + the loop edge (K-1 -> 0)
    ei, ej, Sij, w = [], [], [], []
    for k in range(K - 1):
        ei.append(k)
        ej.append(k + 1)
        Sij.append(np.asarray(S_gt[k] @ np.linalg.inv(S_gt[k + 1])))
        w.append(1.0)
    ei.append(K - 1)
    ej.append(0)
    Sij.append(np.asarray(S_gt[K - 1] @ np.linalg.inv(S_gt[0])))
    w.append(5.0)
    edges = pg.PoseGraphEdges(
        jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(Sij), jnp.float32),
        jnp.asarray(w, jnp.float32),
    )
    valid = jnp.ones((K,), bool)
    fixed = jnp.zeros((K,), bool).at[0].set(True)
    return S_est, S_gt_a, edges, valid, fixed


def test_distributed_matches_single_device():
    S_est, S_gt, edges, valid, fixed = _ring_problem()
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))

    S_single = pg.optimize_pose_graph(S_est, valid, fixed, edges, iters=15)
    S_dist = distributed_pose_graph(mesh, S_est, valid, fixed, edges, iters=15)

    # distributed == single device (up to f32 psum reduction order)
    d = np.asarray(jax.vmap(lie.sim3_log)(S_dist @ jax.vmap(lie.sim3_inv)(S_single)))
    assert np.abs(d).max() < 1e-3

    # and the loop drift is actually corrected
    e = np.asarray(jax.vmap(lie.sim3_log)(S_dist @ jax.vmap(lie.sim3_inv)(S_gt)))
    assert np.abs(e).max() < 0.02


def test_distributed_fix_scale_keeps_scale():
    S_est, S_gt, edges, valid, fixed = _ring_problem(drift=0.03, seed=2)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    S_dist = distributed_pose_graph(
        mesh, S_est, valid, fixed, edges, iters=15, fix_scale=True
    )
    # 6-DoF mode: rotation blocks stay orthonormal (scale 1)
    R = np.asarray(S_dist)[:, :3, :3]
    s = np.cbrt(np.abs(np.linalg.det(R)))
    assert np.abs(s - 1.0).max() < 1e-3
