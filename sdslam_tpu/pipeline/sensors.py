"""EKF motion models: constant-velocity and IMU-aided prediction.

TPU-native equivalent of src/sensors/ (Sensor.{h,cc}, ConstantVelocity.cc,
IMU.cc, EKF.cc): the reference replaces ORB-SLAM2's simple velocity model
with an EKF whose prediction seeds the direct image alignment
(Tracking.cc:132-138, 215-227, 661) and whose update filters the tracked
pose (Tracking.cc:245).

Design notes (same estimator structure, tidier state):
  * ConstantVelocity: state = body twist [v(3), w(3)] (m/s, rad/s), as in
    ConstantVelocity.cc:52-55 — predicted pose = Exp(x*dt) * last_pose.
    Measurement = relative twist Log(T_meas * last_pose^-1)/dt
    (ConstantVelocity.cc:105-122).
  * Innovation chi2 gating: a wildly inconsistent pose measurement (a bad
    frame) updates the filter only weakly or not at all — this is what stops
    single-frame tracking errors from poisoning the velocity and then the
    next frame's alignment seed (the raw-velocity feedback loop).
  * IMU: gyro/accel enter as extra measurements smoothing the twist
    (IMU.cc:233-240 low-pass gravity removal) — not preintegration, matching
    the reference's design (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as _R

from sdslam_tpu.geometry import lie

CHI2_GATE_6DOF = 16.81


# ---------------------------------------------------------------------------
# Device-resident EKF (pure jnp): same estimator as ConstantVelocityEKF below
# but expressed as functions over an EKFState pytree so the whole per-frame
# loop can live in ONE jitted program (each host<->device boundary costs a
# ~25 ms tunnel round trip on the target deployment).
# ---------------------------------------------------------------------------


class EKFState(NamedTuple):
    x: jnp.ndarray  # [6] twist (v, w)
    P: jnp.ndarray  # [6,6] covariance
    last_pose: jnp.ndarray  # [4,4] Tcw of the last accepted measurement
    started: jnp.ndarray  # bool scalar: one update absorbed
    has_pose: jnp.ndarray  # bool scalar: last_pose meaningful

    # noise constants (python floats baked into the jitted program)
    SIGMA_A = 1.0
    SIGMA_ALPHA = 1.0
    SIGMA_V_MEAS = 0.15
    SIGMA_W_MEAS = 0.15


def ekf_init(T0=None) -> EKFState:
    has = T0 is not None
    return EKFState(
        x=jnp.zeros(6, jnp.float32),
        P=jnp.eye(6, dtype=jnp.float32) * 1e2,
        # COPY the seed pose: EKFState lives in the donated DeviceState
        # pytree, so aliasing a caller-held array here would let the first
        # donated tracker step delete the caller's reference out from under
        # it ("Array has been deleted" on the next host read)
        last_pose=(jnp.array(T0, jnp.float32, copy=True) if has
                   else jnp.eye(4, jnp.float32)),
        started=jnp.asarray(False),
        has_pose=jnp.asarray(has),
    )


def ekf_predict(s: EKFState, dt):
    """Returns (state, T_pred). Before the first update T_pred = last pose."""
    dt = jnp.maximum(dt, 1e-4)
    q = jnp.concatenate(
        [jnp.full((3,), EKFState.SIGMA_A**2), jnp.full((3,), EKFState.SIGMA_ALPHA**2)]
    ).astype(jnp.float32)
    P = s.P + jnp.diag(q) * dt * dt
    T_pred = jnp.where(
        s.started,
        lie.se3_normalize(lie.se3_exp(s.x * dt) @ s.last_pose),
        s.last_pose,
    )
    return s._replace(P=P), T_pred


def ekf_update(s: EKFState, T_meas, dt, ok) -> EKFState:
    """Fuse a tracked pose when `ok` (a traced bool); innovation-gated."""
    dt = jnp.maximum(dt, 1e-4)
    T_meas = T_meas.astype(jnp.float32)
    rel = T_meas @ lie.se3_inv(s.last_pose)
    z = lie.se3_log(rel) / dt
    R = jnp.diag(
        jnp.concatenate(
            [
                jnp.full((3,), EKFState.SIGMA_V_MEAS**2),
                jnp.full((3,), EKFState.SIGMA_W_MEAS**2),
            ]
        ).astype(jnp.float32)
    )
    y = z - s.x
    S = s.P + R
    m2 = y @ jnp.linalg.solve(S, y)
    gated = s.started & (m2 > CHI2_GATE_6DOF * 10)
    K = s.P @ jnp.linalg.inv(S)
    x_new = s.x + K @ y
    P_new = (jnp.eye(6, dtype=jnp.float32) - K) @ s.P
    # first-ever measurement only seeds last_pose (matches host EKF.update)
    seed_only = ok & (~s.has_pose)
    accept = ok & s.has_pose & (~gated)
    take_pose = ok & (~gated | ~s.started)
    return EKFState(
        x=jnp.where(accept, x_new, s.x),
        P=jnp.where(accept, P_new, s.P),
        last_pose=jnp.where(take_pose | seed_only, T_meas, s.last_pose),
        started=s.started | accept,
        has_pose=s.has_pose | ok,
    )


# ---------------------------------------------------------------------------
# Device-resident 16-state IMU EKF (jnp port of IMUStateEKF below).
#
# Why on-device: the host filter necessarily fuses a pose that lags
# PIPELINE_DEPTH frames behind the frame being tracked (the async drain);
# under aggressive motion the stale-pose update injects velocity error
# exactly when the filter matters most (VERDICT r2 weak #4). Inside the
# fused step the filter sees the CURRENT frame's tracked pose and both
# gyro+accel channels with zero lag — the reference's same-frame semantics
# (EKF.cc:44-104, Tracking.cc:215-245). It is 16x16 f32 math: trivial for
# the device, and it removes a host<->device round trip.
# ---------------------------------------------------------------------------


class IMUState(NamedTuple):
    X: jnp.ndarray  # [16]: x(3), q(4 wxyz), v(3), w(3), a(3) — camera Tcw
    P: jnp.ndarray  # [16,16]
    gravity: jnp.ndarray  # [3] low-pass filtered accelerometer gravity
    updated: jnp.ndarray  # bool: one update absorbed

    # noise constants (IMU.cc:26-29, Sensor.cc:24-32)
    COV_X2, COV_Q2, COV_V2, COV_W2, COV_A2 = 2.5e-3, 1e-5, 6.25e-4, 6.25e-4, 6.25e-4
    SIGMA_X, SIGMA_Q, SIGMA_V, SIGMA_W = 0.05, 0.02, 4.0, 6.0
    SIGMA_GYRO, SIGMA_ACC = 2.60, 8.94
    GRAVITY_TAU = 0.27


def imu_init() -> IMUState:
    P = jnp.zeros((16, 16), jnp.float32)
    P = P.at[0:3, 0:3].set(jnp.eye(3) * IMUState.COV_X2)
    P = P.at[3:7, 3:7].set(jnp.eye(4) * IMUState.COV_Q2)
    P = P.at[7:10, 7:10].set(jnp.eye(3) * IMUState.COV_V2)
    P = P.at[10:13, 10:13].set(jnp.eye(3) * IMUState.COV_W2)
    P = P.at[13:16, 13:16].set(jnp.eye(3) * IMUState.COV_A2)
    X = jnp.zeros(16, jnp.float32).at[3].set(1.0)
    return IMUState(
        X=X, P=P, gravity=jnp.zeros(3, jnp.float32), updated=jnp.asarray(False)
    )


def _jquat_from_w(w):
    """Quaternion [w,x,y,z] from a rotation vector (Sensor.cc:75-93),
    branchless near angle=0."""
    a2 = jnp.sum(w * w)
    a = jnp.sqrt(jnp.maximum(a2, 1e-24))
    s = jnp.where(a2 < 1e-12, 0.5 - a2 / 48.0, jnp.sin(a / 2.0) / a)
    return jnp.concatenate([jnp.cos(a / 2.0)[None], s * w])


def _jquat_jac_left(q):
    """d(p (x) q)/dp for fixed q (Sensor::QuaternionJacobian)."""
    w, x, y, z = q
    return jnp.array([
        [w, -x, -y, -z],
        [x, w, z, -y],
        [y, -z, w, x],
        [z, y, -x, w],
    ])


def _jquat_jac_right(q):
    w, x, y, z = q
    return jnp.array([
        [w, -x, -y, -z],
        [x, w, -z, y],
        [y, z, w, -x],
        [z, -y, x, w],
    ])


def _jdq_by_dw(q, w, dt):
    """d(q (x) exp(w dt))/dw: [4,3] (Sensor::dq_by_dw), branchless."""
    n2 = jnp.sum(w * w)
    n = jnp.sqrt(jnp.maximum(n2, 1e-24))
    small = n2 < 1e-12
    beta = n * dt / 2.0
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    u = w / jnp.where(small, 1.0, n)
    eye = jnp.eye(3, dtype=jnp.float32)
    uu = u[:, None] * u[None, :]
    m_top = (-dt / 2.0) * sb * u  # [3]
    sb_n = jnp.where(small, dt / 2.0, sb / n)
    m_body = (dt / 2.0) * cb * uu + sb_n * (eye - uu)
    m_body = jnp.where(small, eye * (dt / 2.0), m_body)
    m = jnp.concatenate([m_top[None, :], m_body], axis=0)  # [4,3]
    return _jquat_jac_right(q) @ m


def _jvec7_to_pose(v):
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(lie.quat_to_mat(lie.quat_normalize(v[3:7])))
    return T.at[:3, 3].set(v[:3])


def _jpose_to_vec7(T):
    q = lie.mat_to_quat(T[:3, :3])
    return jnp.concatenate([T[:3, 3], q])


def imu_predict(s: IMUState, dt):
    """Propagate; returns (state, predicted camera Tcw). Before the first
    update dt is treated as 0 (EKF.cc:45-50)."""
    dt = jnp.where(s.updated, jnp.maximum(dt, 0.0), 0.0)
    X = s.X
    q, w = X[3:7], X[10:13]
    dq = _jdq_by_dw(q, w, dt)
    # jF
    jF = jnp.eye(16, dtype=jnp.float32)
    jF = jF.at[0:3, 7:10].set(jnp.eye(3) * dt)
    jF = jF.at[7:10, 13:16].set(jnp.eye(3) * dt)
    jF = jF.at[3:7, 3:7].set(_jquat_jac_left(_jquat_from_w(w * dt)))
    jF = jF.at[3:7, 10:13].set(dq)
    # Q via G Pn G^T (IMU::Q)
    Pn = jnp.zeros((9, 9), jnp.float32)
    Pn = Pn.at[0:3, 0:3].set(jnp.eye(3) * (IMUState.SIGMA_V * dt) ** 2)
    Pn = Pn.at[3:6, 3:6].set(jnp.eye(3) * (IMUState.SIGMA_W * dt) ** 2)
    Pn = Pn.at[6:9, 6:9].set(jnp.eye(3) * (IMUState.SIGMA_ACC * dt) ** 2)
    G = jnp.zeros((16, 9), jnp.float32)
    G = G.at[0:3, 0:3].set(jnp.eye(3) * dt)
    G = G.at[7:10, 0:3].set(jnp.eye(3))
    G = G.at[7:10, 6:9].set(jnp.eye(3) * dt)
    G = G.at[10:13, 3:6].set(jnp.eye(3))
    G = G.at[13:16, 6:9].set(jnp.eye(3))
    G = G.at[3:7, 3:6].set(dq)
    Q = G @ Pn @ G.T
    # F: x += v dt; q (x)= exp(w dt); v += a dt
    Xn = X.at[0:3].add(X[7:10] * dt)
    Xn = Xn.at[3:7].set(lie.quat_mul(q, _jquat_from_w(w * dt)))
    Xn = Xn.at[7:10].add(X[13:16] * dt)
    P = jF @ s.P @ jF.T + Q
    s2 = s._replace(X=Xn, P=P)
    return s2, _jvec7_to_pose(Xn[:7])


def imu_update(s: IMUState, Tcw, gyro, accel, dt, ok) -> IMUState:
    """Fuse the CURRENT frame's tracked pose + raw IMU when `ok` (traced
    bool). First-ever measurement seeds the state (EKF.cc:75-78)."""
    dt = jnp.maximum(dt, 1e-4)
    alpha = IMUState.GRAVITY_TAU / (IMUState.GRAVITY_TAU + dt)
    gravity = jnp.where(s.updated, alpha * s.gravity + (1 - alpha) * accel, accel)
    z = jnp.concatenate([_jpose_to_vec7(Tcw), gyro, accel - gravity])
    # hemisphere-align the measured quaternion against the state
    flip = jnp.sum(z[3:7] * s.X[3:7]) < 0
    z = z.at[3:7].multiply(jnp.where(flip, -1.0, 1.0))
    h = jnp.concatenate([s.X[0:7], s.X[10:13], s.X[13:16]])
    jH = jnp.zeros((13, 16), jnp.float32)
    jH = jH.at[0:7, 0:7].set(jnp.eye(7))
    jH = jH.at[7:10, 10:13].set(jnp.eye(3))
    jH = jH.at[10:13, 13:16].set(jnp.eye(3))
    Rm = jnp.zeros((13, 13), jnp.float32)
    Rm = Rm.at[0:3, 0:3].set(jnp.eye(3) * (IMUState.SIGMA_X * dt) ** 2)
    Rm = Rm.at[3:7, 3:7].set(jnp.eye(4) * (IMUState.SIGMA_Q * dt) ** 2)
    Rm = Rm.at[7:10, 7:10].set(jnp.eye(3) * (IMUState.SIGMA_GYRO * dt) ** 2)
    Rm = Rm.at[10:13, 10:13].set(jnp.eye(3) * (IMUState.SIGMA_ACC * dt) ** 2)
    y = z - h
    S = jH @ s.P @ jH.T + Rm
    Kg = s.P @ jH.T @ jnp.linalg.inv(S)
    Xn = s.X + Kg @ y
    Pn = s.P - Kg @ S @ Kg.T
    Xn = Xn.at[3:7].set(lie.quat_normalize(Xn[3:7]))
    # first-ever measurement: seed pose, zero the rest (EKF.cc:75-78)
    X_seed = jnp.zeros(16, jnp.float32).at[0:7].set(z[0:7])
    X_out = jnp.where(s.updated, Xn, X_seed)
    P_out = jnp.where(s.updated, Pn, s.P)
    return IMUState(
        X=jnp.where(ok, X_out, s.X),
        P=jnp.where(ok, P_out, s.P),
        gravity=jnp.where(ok, gravity, s.gravity),
        updated=s.updated | ok,
    )


def _np_se3_exp(xi: np.ndarray) -> np.ndarray:
    """numpy SE3 exp (host-side filter math must not dispatch eager jnp ops
    per frame — eager dispatch overhead dominated per-frame latency)."""
    rho, phi = xi[:3], xi[3:]
    R = _R.from_rotvec(phi).as_matrix()
    th2 = float(phi @ phi)
    K = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]])
    if th2 < 1e-10:
        V = np.eye(3) + 0.5 * K
    else:
        th = np.sqrt(th2)
        V = (
            np.eye(3)
            + (1 - np.cos(th)) / th2 * K
            + (th - np.sin(th)) / (th2 * th) * (K @ K)
        )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ rho
    return T


def _np_se3_log(T: np.ndarray) -> np.ndarray:
    R = T[:3, :3]
    phi = _R.from_matrix(R).as_rotvec()
    th2 = float(phi @ phi)
    K = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]])
    if th2 < 1e-10:
        Vinv = np.eye(3) - 0.5 * K
    else:
        th = np.sqrt(th2)
        half = 0.5 * th
        cot = half * np.cos(half) / np.sin(half)
        Vinv = np.eye(3) - 0.5 * K + (1 - cot) / th2 * (K @ K)
    return np.concatenate([Vinv @ T[:3, 3], phi])


@dataclasses.dataclass
class ConstantVelocityEKF:
    """Constant-velocity EKF over the body twist."""

    # process noise: twist random walk (accel) spectral density
    sigma_a: float = 1.0  # m/s^2
    sigma_alpha: float = 1.0  # rad/s^2
    # measurement noise on the relative twist (pose noise / dt)
    sigma_v_meas: float = 0.15  # m/s
    sigma_w_meas: float = 0.15  # rad/s

    x: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(6))
    P: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(6) * 1e2)
    last_pose: Optional[np.ndarray] = None  # [4,4] Tcw
    started: bool = False

    def restart(self):
        """EKF::Restart (EKF.cc, called on tracking failure/reloc,
        Tracking.cc:221,226,247,1126)."""
        self.x = np.zeros(6)
        self.P = np.eye(6) * 1e2
        self.last_pose = None
        self.started = False

    def predict(self, dt: float) -> Optional[np.ndarray]:
        """Returns predicted Tcw (None before the first update)."""
        if not self.started or self.last_pose is None:
            return None
        Q = np.diag(
            [self.sigma_a**2] * 3 + [self.sigma_alpha**2] * 3
        ) * max(dt, 1e-4) ** 2
        self.P = self.P + Q
        return (_np_se3_exp(self.x * dt) @ self.last_pose).astype(np.float32)

    def update(self, T_meas: np.ndarray, dt: float) -> bool:
        """Fuse a tracked pose. Returns False if gated out (inconsistent)."""
        T_meas = np.asarray(T_meas, np.float32)
        if self.last_pose is None:
            self.last_pose = T_meas
            return True
        dt = max(dt, 1e-4)
        rel = T_meas @ np.linalg.inv(self.last_pose)
        z = _np_se3_log(rel.astype(np.float64)) / dt
        R = np.diag(
            [self.sigma_v_meas**2] * 3 + [self.sigma_w_meas**2] * 3
        ) / dt**2 * max(dt, 1e-4) ** 2  # twist-rate noise ~ pose noise / dt
        y = z - self.x
        S = self.P + R
        m2 = float(y @ np.linalg.solve(S, y))
        if self.started and m2 > CHI2_GATE_6DOF * 10:
            # measurement wildly inconsistent with the motion model: do not
            # absorb it into the velocity (the caller decides whether to
            # trust the pose itself)
            return False
        K = self.P @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(6) - K) @ self.P
        self.last_pose = T_meas
        self.started = True
        return True


# ---------------------------------------------------------------------------
# Full 16-state IMU EKF (parity with the reference's IMU sensor model)
# ---------------------------------------------------------------------------


def _quat_mul(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Hamilton product, [w,x,y,z] convention."""
    pw, px, py, pz = p
    qw, qx, qy, qz = q
    return np.array([
        pw * qw - px * qx - py * qy - pz * qz,
        pw * qx + px * qw + py * qz - pz * qy,
        pw * qy - px * qz + py * qw + pz * qx,
        pw * qz + px * qy - py * qx + pz * qw,
    ])


def _quat_from_w(w: np.ndarray) -> np.ndarray:
    """Quaternion from a rotation vector (Sensor.cc:75-93 semantics)."""
    angle = float(np.linalg.norm(w))
    if angle <= 0.0:
        return np.array([1.0, 0.0, 0.0, 0.0])
    s = np.sin(angle / 2.0) / angle
    return np.array([np.cos(angle / 2.0), s * w[0], s * w[1], s * w[2]])


def _quat_jac_left(q: np.ndarray) -> np.ndarray:
    """d(p ⊗ q)/dp for fixed q: 4x4 (Sensor::QuaternionJacobian)."""
    w, x, y, z = q
    return np.array([
        [w, -x, -y, -z],
        [x, w, z, -y],
        [y, -z, w, x],
        [z, y, -x, w],
    ])


def _quat_jac_right(q: np.ndarray) -> np.ndarray:
    """d(q ⊗ p)/dp for fixed q: 4x4 (Sensor::QuaternionJacobianRight)."""
    w, x, y, z = q
    return np.array([
        [w, -x, -y, -z],
        [x, w, -z, y],
        [y, z, w, -x],
        [z, -y, x, w],
    ])


def _dq_by_dw(q: np.ndarray, w: np.ndarray, dt: float) -> np.ndarray:
    """d(q ⊗ exp(w·dt))/dw: 4x3 (Sensor::dq_by_dw, Sensor.cc:126-160)."""
    n = float(np.linalg.norm(w))
    if n == 0.0:
        return np.vstack([np.zeros((1, 3)), np.eye(3) * (dt / 2.0)])
    beta = n * dt / 2.0
    sb, cb = np.sin(beta), np.cos(beta)
    u = w / n
    m = np.zeros((4, 3))
    m[0] = (-dt / 2.0) * sb * u
    for i in range(3):
        for j in range(3):
            if i == j:
                m[i + 1, j] = (dt / 2.0) * cb * u[i] * u[i] + (sb / n) * (1.0 - u[i] * u[i])
            else:
                m[i + 1, j] = u[i] * u[j] * ((dt / 2.0) * cb - sb / n)
    return _quat_jac_right(q) @ m


def _pose_to_vec7(T: np.ndarray) -> np.ndarray:
    """[t(3), q(4 wxyz)] from a 4x4 pose (Sensor::PoseToVector)."""
    q = _R.from_matrix(np.asarray(T, float)[:3, :3]).as_quat()  # xyzw
    return np.concatenate([np.asarray(T, float)[:3, 3],
                           [q[3], q[0], q[1], q[2]]])


def _vec7_to_pose(v: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    w, x, y, z = v[3:7]
    T[:3, :3] = _R.from_quat([x, y, z, w]).as_matrix()
    T[:3, 3] = v[:3]
    return T


class IMUStateEKF:
    """Full 16-state IMU EKF, the reference's MONOCULAR_IMU sensor model
    (src/sensors/IMU.{h,cc} + EKF.cc): state [x(3), q(4 wxyz), v(3), w(3),
    a(3)]; measurement [pose(7), gyro(3), accel-minus-gravity(3)] (13-dim,
    IMU.cc:161-178); gravity tracked by a low-pass filter
    alpha = 0.27/(0.27+dt) (IMU.cc:233-240). The camera pose drives the
    filter; the IMU smooths/predicts — NOT preintegration (SURVEY §2.5).

    Host-side float64 (16x16 matrices once per frame — the reference also
    runs this on the CPU in doubles; device arrays would waste a tunnel
    round trip on 2 KB of math)."""

    # Sensor.cc:24-32, IMU.cc:26-29
    COV_X2, COV_Q2, COV_V2, COV_W2, COV_A2 = 2.5e-3, 1e-5, 6.25e-4, 6.25e-4, 6.25e-4
    SIGMA_X, SIGMA_Q, SIGMA_V, SIGMA_W = 0.05, 0.02, 4.0, 6.0
    SIGMA_GYRO, SIGMA_ACC = 2.60, 8.94
    GRAVITY_TAU = 0.27

    def __init__(self):
        self.restart()

    def restart(self):
        self.X = np.zeros(16)
        self.X[3] = 1.0  # identity quaternion
        self.P = np.zeros((16, 16))
        self.P[0:3, 0:3] = np.eye(3) * self.COV_X2
        self.P[3:7, 3:7] = np.eye(4) * self.COV_Q2
        self.P[7:10, 7:10] = np.eye(3) * self.COV_V2
        self.P[10:13, 10:13] = np.eye(3) * self.COV_W2
        self.P[13:16, 13:16] = np.eye(3) * self.COV_A2
        self.gravity = np.zeros(3)
        self.updated = False

    # -- model -----------------------------------------------------------

    def _F(self, X: np.ndarray, dt: float) -> np.ndarray:
        """x += v·dt; q ⊗= exp(w·dt); v += a·dt (IMU::F)."""
        Xn = X.copy()
        Xn[0:3] = X[0:3] + X[7:10] * dt
        Xn[3:7] = _quat_mul(X[3:7], _quat_from_w(X[10:13] * dt))
        Xn[7:10] = X[7:10] + X[13:16] * dt
        return Xn

    def _jF(self, X: np.ndarray, dt: float) -> np.ndarray:
        J = np.eye(16)
        J[0:3, 7:10] = np.eye(3) * dt
        J[7:10, 13:16] = np.eye(3) * dt
        J[3:7, 3:7] = _quat_jac_left(_quat_from_w(X[10:13] * dt))
        J[3:7, 10:13] = _dq_by_dw(X[3:7], X[10:13], dt)
        return J

    def _Q(self, X: np.ndarray, dt: float) -> np.ndarray:
        """Process noise via the G P_n Gᵀ construction (IMU::Q)."""
        Pn = np.zeros((9, 9))
        Pn[0:3, 0:3] = np.eye(3) * (self.SIGMA_V * dt) ** 2
        Pn[3:6, 3:6] = np.eye(3) * (self.SIGMA_W * dt) ** 2
        Pn[6:9, 6:9] = np.eye(3) * (self.SIGMA_ACC * dt) ** 2
        G = np.zeros((16, 9))
        G[0:3, 0:3] = np.eye(3) * dt
        G[7:10, 0:3] = np.eye(3)
        G[7:10, 6:9] = np.eye(3) * dt
        G[10:13, 3:6] = np.eye(3)
        G[13:16, 6:9] = np.eye(3)
        G[3:7, 3:6] = _dq_by_dw(X[3:7], X[10:13], dt)
        return G @ Pn @ G.T

    def _R_meas(self, dt: float) -> np.ndarray:
        Rm = np.zeros((13, 13))
        Rm[0:3, 0:3] = np.eye(3) * (self.SIGMA_X * dt) ** 2
        Rm[3:7, 3:7] = np.eye(4) * (self.SIGMA_Q * dt) ** 2
        Rm[7:10, 7:10] = np.eye(3) * (self.SIGMA_GYRO * dt) ** 2
        Rm[10:13, 10:13] = np.eye(3) * (self.SIGMA_ACC * dt) ** 2
        return Rm

    # -- filter loop (EKF.cc:44-104) ---------------------------------------

    def predict(self, dt: float) -> np.ndarray:
        """Propagate; returns the predicted camera pose. Before the first
        update dt is treated as 0 (EKF.cc:45-50)."""
        if not self.updated:
            dt = 0.0
        dt = max(dt, 0.0)
        jF = self._jF(self.X, dt)
        Q = self._Q(self.X, dt)
        self.X = self._F(self.X, dt)
        self.P = jF @ self.P @ jF.T + Q
        return _vec7_to_pose(self.X[:7])

    def update(self, pose: np.ndarray, gyro, accel, dt: float):
        """Fuse tracked pose + raw IMU (IMU::Z builds the measurement;
        first-ever measurement seeds the state, EKF.cc:75-78)."""
        dt = max(dt, 1e-4)
        alpha = self.GRAVITY_TAU / (self.GRAVITY_TAU + dt)
        accel = np.asarray(accel, float)
        if not self.updated:
            self.gravity = accel.copy()
        else:
            self.gravity = alpha * self.gravity + (1 - alpha) * accel
        z = np.concatenate([
            _pose_to_vec7(pose), np.asarray(gyro, float), accel - self.gravity
        ])
        if not self.updated:
            self.X[:] = 0.0
            self.X[0:7] = z[0:7]
            self.updated = True
            return
        # hemisphere-align the measured quaternion (q and -q are the same
        # rotation; a raw component difference across the sign flip would
        # inject a huge bogus innovation — hardening the reference lacks)
        if np.dot(z[3:7], self.X[3:7]) < 0:
            z[3:7] = -z[3:7]
        h = np.concatenate([self.X[0:7], self.X[10:13], self.X[13:16]])
        jH = np.zeros((13, 16))
        jH[0:7, 0:7] = np.eye(7)
        jH[7:10, 10:13] = np.eye(3)
        jH[10:13, 13:16] = np.eye(3)
        Rm = self._R_meas(dt)
        y = z - h
        S = jH @ self.P @ jH.T + Rm
        K = self.P @ jH.T @ np.linalg.inv(S)
        self.X = self.X + K @ y
        self.P = self.P - K @ S @ K.T
        n = np.linalg.norm(self.X[3:7])
        if n > 1e-9:
            self.X[3:7] /= n

    # -- accessors used by the fusion pipeline ----------------------------

    def angular_rate(self) -> np.ndarray:
        return self.X[10:13].copy()

    def pose(self) -> np.ndarray:
        return _vec7_to_pose(self.X[:7])

