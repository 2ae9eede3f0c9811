"""Streaming front-end: message types, approximate-time sync, odometry out.

ROS-free equivalent of the reference's ROS nodes
(/root/reference/Examples/ROS/SD-SLAM/src/{ros_monocular,ros_rgbd,
ros_fusion}.cc). The target deployment has no ROS, but the capabilities the
nodes provide are part of the framework surface:

  * message containers for camera / depth / IMU samples,
  * approximate-time pairing of two asynchronous streams (the reference
    uses message_filters::sync_policies::ApproximateTime with queue size
    10, ros_rgbd.cc / ros_fusion.cc:30),
  * a runner that feeds synchronized pairs into `SDSlamSystem` and emits
    odometry records (pose + twist-free stamped transform — the
    `/sdslam/odom` publisher, ros_rgbd.cc:107-175), optionally carrying the
    ORIGINAL image timestamps so trajectories can be evaluated against TUM
    groundtruth (Config::UseImagesTimeStamps, Config.h:100).

Everything is plain Python/NumPy on the host — this layer never touches the
device; it exists so a live system (camera driver, socket, bag reader) can
push frames exactly like ROS callbacks would.
"""

from __future__ import annotations

import dataclasses
import threading
from collections import deque
from typing import Callable, Deque, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ImageMsg:
    """A stamped intensity or depth image (sensor_msgs/Image analogue)."""

    stamp: float  # seconds
    data: np.ndarray  # [H,W] u8 intensity or u16/f32 depth
    frame_id: str = "camera"


@dataclasses.dataclass(frozen=True)
class ImuMsg:
    """A stamped IMU sample (sensor_msgs/Imu analogue; the reference's
    fusion node consumes angular_velocity + linear_acceleration,
    ros_fusion.cc)."""

    stamp: float
    angular_velocity: np.ndarray  # [3] rad/s
    linear_acceleration: np.ndarray  # [3] m/s^2


@dataclasses.dataclass(frozen=True)
class OdometryMsg:
    """A stamped pose estimate (nav_msgs/Odometry analogue,
    ros_rgbd.cc:107-175): world-from-camera transform."""

    stamp: float
    Twc: np.ndarray  # [4,4]
    tracked: bool
    frame_id: str = "world"
    child_frame_id: str = "camera"

    @property
    def position(self) -> np.ndarray:
        return self.Twc[:3, 3]

    @property
    def quaternion_xyzw(self) -> np.ndarray:
        from sdslam_tpu.geometry.lie import mat_to_quat

        q = np.asarray(mat_to_quat(self.Twc[:3, :3]))  # [w,x,y,z]
        return np.array([q[1], q[2], q[3], q[0]])


class ApproximateTimeSync:
    """Pair two asynchronous stamped streams by nearest timestamp.

    Mirrors message_filters ApproximateTime as the reference's RGBD/Fusion
    nodes configure it (queue size 10, ros_fusion.cc:30): each stream
    buffers up to `queue_size` messages; whenever a pairing with time
    difference <= `slop` exists, the earliest such pair is emitted to the
    callback and older messages are discarded.
    """

    def __init__(
        self,
        callback: Callable[[object, object], None],
        queue_size: int = 10,
        slop: float = 0.02,
    ):
        self._cb = callback
        self._slop = float(slop)
        self._qa: Deque = deque(maxlen=queue_size)
        self._qb: Deque = deque(maxlen=queue_size)
        self._lock = threading.Lock()

    def push_a(self, msg) -> None:
        with self._lock:
            self._qa.append(msg)
            self._try_emit()

    def push_b(self, msg) -> None:
        with self._lock:
            self._qb.append(msg)
            self._try_emit()

    def _try_emit(self) -> None:
        while self._qa and self._qb:
            best: Optional[Tuple[int, int, float]] = None
            for i, a in enumerate(self._qa):
                for j, b in enumerate(self._qb):
                    dt = abs(a.stamp - b.stamp)
                    if dt <= self._slop and (best is None or dt < best[2]):
                        best = (i, j, dt)
            if best is None:
                # drop the oldest of whichever stream has run ahead
                if (
                    len(self._qa) == self._qa.maxlen
                    and self._qa[0].stamp < self._qb[0].stamp - self._slop
                ):
                    self._qa.popleft()
                    continue
                if (
                    len(self._qb) == self._qb.maxlen
                    and self._qb[0].stamp < self._qa[0].stamp - self._slop
                ):
                    self._qb.popleft()
                    continue
                return
            i, j, _ = best
            a, b = self._qa[i], self._qb[j]
            # discard everything at or before the matched messages
            for _ in range(i + 1):
                self._qa.popleft()
            for _ in range(j + 1):
                self._qb.popleft()
            self._cb(a, b)


def associate_imu_to_frames(
    frame_stamps: Sequence[float], imu_msgs: Sequence[ImuMsg]
) -> List[Optional[ImuMsg]]:
    """Timestamp-associate one IMU sample to each frame (the fusion
    example's CSV association, Examples/Fusion/monocular_imu.cc:105-145):
    nearest IMU row not newer than the frame, else the overall nearest."""
    out: List[Optional[ImuMsg]] = []
    if not imu_msgs:
        return [None] * len(frame_stamps)
    stamps = np.array([m.stamp for m in imu_msgs])
    for t in frame_stamps:
        k = int(np.argmin(np.abs(stamps - t)))
        out.append(imu_msgs[k])
    return out


class StreamRunner:
    """Drive an `SDSlamSystem` from pushed messages, emitting odometry.

    RGB-D: push intensity to `push_image` and depth to `push_depth`; pairs
    are approximate-time synchronized and tracked. Monocular: push images
    only (no sync). Fusion: additionally push IMU samples; the latest
    sample at or before each frame is attached (the ROS fusion node's
    approximate-time sync of image+IMU, ros_fusion.cc:30).

    `use_image_timestamps` keeps the original image stamps on the emitted
    odometry (Config::UseImagesTimeStamps; ros_rgbd.cc publishes either the
    image stamp or now() so TUM evaluation can line up with groundtruth).
    """

    def __init__(
        self,
        system,
        sensor: str = "rgbd",
        queue_size: int = 10,
        slop: float = 0.02,
        use_image_timestamps: bool = True,
        odom_callback: Optional[Callable[[OdometryMsg], None]] = None,
    ):
        self.system = system
        self.sensor = sensor
        self.use_image_timestamps = use_image_timestamps
        self.odometry: List[OdometryMsg] = []
        self._odom_cb = odom_callback
        self._imu_buf: Deque[ImuMsg] = deque(maxlen=200)
        self._frame_count = 0
        if sensor == "rgbd":
            self._sync = ApproximateTimeSync(
                self._on_rgbd_pair, queue_size=queue_size, slop=slop
            )
        else:
            self._sync = None

    # -- message inputs ----------------------------------------------------

    def push_image(self, msg: ImageMsg) -> None:
        if self.sensor == "rgbd":
            self._sync.push_a(msg)
        elif self.sensor == "fusion":
            self._on_fusion_frame(msg)
        else:
            self._on_mono_frame(msg)

    def push_depth(self, msg: ImageMsg) -> None:
        assert self.sensor == "rgbd", "depth stream only exists for RGB-D"
        self._sync.push_b(msg)

    def push_imu(self, msg: ImuMsg) -> None:
        self._imu_buf.append(msg)

    # -- per-pair tracking -------------------------------------------------

    def _emit(self, stamp: float, Tcw: np.ndarray) -> None:
        import time as _time

        Tcw = np.asarray(Tcw)
        R = Tcw[:3, :3]
        t = Tcw[:3, 3]
        Twc = np.eye(4)
        Twc[:3, :3] = R.T
        Twc[:3, 3] = -R.T @ t
        odo = OdometryMsg(
            stamp=stamp if self.use_image_timestamps else _time.time(),
            Twc=Twc,
            tracked=self.system.tracker.st.status == "OK",
        )
        self.odometry.append(odo)
        if self._odom_cb is not None:
            self._odom_cb(odo)
        self._frame_count += 1

    def _on_rgbd_pair(self, img: ImageMsg, depth: ImageMsg) -> None:
        pose = self.system.track_rgbd(img.data, depth.data, img.stamp)
        self._emit(img.stamp, pose)

    def _on_mono_frame(self, img: ImageMsg) -> None:
        pose = self.system.track_monocular(img.data, img.stamp)
        self._emit(img.stamp, pose)

    def _on_fusion_frame(self, img: ImageMsg) -> None:
        # latest IMU sample at or before the frame (nearest fallback)
        m = None
        for s in reversed(self._imu_buf):
            if s.stamp <= img.stamp:
                m = s
                break
        if m is None and self._imu_buf:
            m = self._imu_buf[0]
        meas = (
            np.concatenate([m.angular_velocity, m.linear_acceleration])
            if m is not None
            else np.zeros(6)
        )
        pose = self.system.track_fusion(img.data, meas, img.stamp)
        self._emit(img.stamp, pose)

    # -- outputs -------------------------------------------------------------

    def write_tum_trajectory(self, path: str) -> None:
        """TUM-format odometry dump (timestamp tx ty tz qx qy qz qw) — the
        evaluation-file path of sdslam_TUM1_evaluation_file.launch."""
        with open(path, "w") as f:
            for o in self.odometry:
                p = o.position
                q = o.quaternion_xyzw
                f.write(
                    f"{o.stamp:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
                )
