"""Distributed BA on the 8-device virtual CPU mesh: must match single-device
results and converge on synthetic problems."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sdslam_tpu.geometry import lie
from sdslam_tpu.parallel import dist_ba
from sdslam_tpu.solvers import ba

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_ba import CAM, make_ba_problem, pose_errs  # noqa: E402


def test_distributed_matches_single_device(rng):
    ms, T_gt, X_gt, n_kf, n_pt = make_ba_problem(rng, noise_px=0.2, stereo=True)
    cam_active = ms.kf_valid.at[0].set(False)
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("dp",))

    ms_d = dist_ba.distributed_bundle_adjust(
        mesh, CAM, ms, cam_active, ms.pt_valid, iters=10
    )
    for k in range(1, n_kf):
        et, er = pose_errs(np.asarray(ms_d.kf_Tcw[k]), T_gt[k])
        assert et < 0.01 and er < 0.01, (k, et, er)

    # compare against the single-device solver on the same problem
    res = ba.bundle_adjust(CAM, ms, cam_active, ms.pt_valid)
    for k in range(1, n_kf):
        d = np.asarray(
            lie.se3_log(ms_d.kf_Tcw[k] @ lie.se3_inv(res.kf_Tcw[k]))
        )
        assert np.abs(d).max() < 0.02  # same optimum basin


def test_distributed_point_updates_local(rng):
    """Sharded point back-substitution must actually move the points."""
    ms, T_gt, X_gt, n_kf, n_pt = make_ba_problem(
        rng, noise_px=0.0, pt_noise=0.05, stereo=True
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    ms_d = dist_ba.distributed_bundle_adjust(
        mesh, CAM, ms, ms.kf_valid.at[0].set(False), ms.pt_valid, iters=10
    )
    err_before = np.linalg.norm(np.asarray(ms.pt_pos[:n_pt]) - X_gt, axis=1)
    err_after = np.linalg.norm(np.asarray(ms_d.pt_pos[:n_pt]) - X_gt, axis=1)
    assert np.median(err_after) < np.median(err_before) * 0.2
