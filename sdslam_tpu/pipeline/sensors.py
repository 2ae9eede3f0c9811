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
        last_pose=jnp.asarray(T0, jnp.float32) if has else jnp.eye(4, jnp.float32),
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


@dataclasses.dataclass
class IMUTwistFilter:
    """Mono+IMU fusion in the reference's style (IMU.cc): gyro gives the
    angular rate directly; accelerometer (gravity-removed by a low-pass with
    alpha = 0.27/(0.27+dt), IMU.cc:233-240) nudges the linear part.
    Used to *predict* between camera frames; the camera pose still drives
    the pose chain via ConstantVelocityEKF."""

    gravity_alpha_tau: float = 0.27
    gravity: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    w_imu: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    a_imu: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    initialized: bool = False

    def feed(self, gyro: np.ndarray, accel: np.ndarray, dt: float):
        alpha = self.gravity_alpha_tau / (self.gravity_alpha_tau + max(dt, 1e-4))
        if not self.initialized:
            self.gravity = np.asarray(accel, float)
            self.initialized = True
        else:
            self.gravity = alpha * self.gravity + (1 - alpha) * np.asarray(accel, float)
        self.w_imu = np.asarray(gyro, float)
        self.a_imu = np.asarray(accel, float) - self.gravity

    def angular_rate(self) -> np.ndarray:
        return self.w_imu
