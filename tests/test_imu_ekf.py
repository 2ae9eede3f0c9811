"""16-state IMU EKF (reference model: src/sensors/IMU.{h,cc} + EKF.cc)."""

import numpy as np

from sdslam_tpu.pipeline.sensors import (
    IMUStateEKF,
    _dq_by_dw,
    _pose_to_vec7,
    _quat_from_w,
    _quat_mul,
    _vec7_to_pose,
)


def _rot(T=None, w=(0.0, 0.0, 0.3), t=(0.1, 0.0, 0.0)):
    from scipy.spatial.transform import Rotation as R

    M = np.eye(4)
    M[:3, :3] = R.from_rotvec(np.asarray(w)).as_matrix()
    M[:3, 3] = t
    return M


def test_pose_vec7_roundtrip():
    T = _rot()
    v = _pose_to_vec7(T)
    assert np.allclose(_vec7_to_pose(v), T, atol=1e-9)


def test_jF_matches_numerical_jacobian():
    f = IMUStateEKF()
    rng = np.random.default_rng(3)
    X = rng.normal(size=16) * 0.3
    X[3:7] /= np.linalg.norm(X[3:7])
    dt = 0.04
    J = f._jF(X, dt)
    eps = 1e-6
    for k in range(16):
        Xp, Xm = X.copy(), X.copy()
        Xp[k] += eps
        Xm[k] -= eps
        num = (f._F(Xp, dt) - f._F(Xm, dt)) / (2 * eps)
        assert np.allclose(J[:, k], num, atol=1e-4), f"column {k}"


def test_dq_by_dw_matches_numerical():
    rng = np.random.default_rng(5)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w = rng.normal(size=3)
    dt = 0.05
    J = _dq_by_dw(q, w, dt)
    eps = 1e-6
    for k in range(3):
        wp, wm = w.copy(), w.copy()
        wp[k] += eps
        wm[k] -= eps
        num = (
            _quat_mul(q, _quat_from_w(wp * dt))
            - _quat_mul(q, _quat_from_w(wm * dt))
        ) / (2 * eps)
        assert np.allclose(J[:, k], num, atol=1e-5)


def test_filter_tracks_constant_rotation():
    """Camera rotating at constant w: after convergence the filter's
    prediction must land on the next pose."""
    f = IMUStateEKF()
    w = np.array([0.0, 0.0, 0.6])
    dt = 1.0 / 30.0
    g_body = np.array([0.0, -9.81, 0.0])
    T = np.eye(4)
    f.predict(dt)
    f.update(T, w, g_body, dt)  # seeds state
    for i in range(40):
        dq = _quat_from_w(w * dt)
        v = _pose_to_vec7(T)
        v[3:7] = _quat_mul(v[3:7], dq)
        T = _vec7_to_pose(v)
        f.predict(dt)
        f.update(T, w, g_body, dt)
    # gravity low-pass converged (alpha = 0.27/(0.27+dt), IMU.cc:233-240)
    assert abs(np.linalg.norm(f.gravity) - 9.81) < 0.5
    # angular rate pulled to the gyro
    assert np.allclose(f.angular_rate(), w, atol=0.15)
    # one more prediction step lands near the true next pose
    dq = _quat_from_w(w * dt)
    v = _pose_to_vec7(T)
    v[3:7] = _quat_mul(v[3:7], dq)
    T_next = _vec7_to_pose(v)
    T_pred = f.predict(dt)
    err = T_pred[:3, :3] @ T_next[:3, :3].T
    ang = np.arccos(np.clip((np.trace(err) - 1) / 2, -1, 1))
    assert ang < 0.02


def test_restart_clears_state():
    f = IMUStateEKF()
    f.predict(0.03)
    f.update(np.eye(4), [0, 0, 1.0], [0, -9.8, 0], 0.03)
    f.restart()
    assert not f.updated
    assert np.allclose(f.X[3:7], [1, 0, 0, 0])
    assert np.allclose(f.gravity, 0)
