"""System facade: the public API of the framework.

Mirrors System (/root/reference/src/System.{h,cc}): sensor-typed frame
routing (TrackMonocular/TrackRGBD/TrackFusion, System.cc:87-254),
localization-only mode (ActivateLocalizationMode, System.cc:236-249), reset,
map save/load (SaveTrajectory/LoadTrajectory, System.cc:277-533) and
trajectory export.

Divergences from the reference, by design:
  * No threads: tracking, local mapping and loop closing run as sequenced
    device computations inside `track_*` (the reference's 3-5 POSIX threads
    become batched kernels; SURVEY.md §2.9).
  * Map persistence is an npz checkpoint of the array-resident MapState
    (including the stored keyframe pyramids the direct-alignment path
    needs) instead of YAML+PNG — same capability: save, load, relocalize,
    run localization-only against the frozen map.
  * Trajectory export uses the TUM evaluation format (timestamp tx ty tz
    qx qy qz qw), which the reference emits via its ROS evaluation path
    (ros_rgbd.cc:107-175).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.mapping import map_state as M
from sdslam_tpu.pipeline.loop_closing import LoopCloser
from sdslam_tpu.pipeline.sensors import IMUStateEKF
from sdslam_tpu.pipeline.tracking import MonoTracker, RGBDTracker
from sdslam_tpu.utils.config import SystemConfig

MONOCULAR = "monocular"
RGBD = "rgbd"
MONOCULAR_IMU = "monocular_imu"


class SDSlamSystem:
    """Facade over the tracking/mapping/loop-closing pipeline."""

    def __init__(
        self,
        config: SystemConfig,
        sensor: str = MONOCULAR,
        loop_closing: bool = True,
    ):
        if sensor not in (MONOCULAR, RGBD, MONOCULAR_IMU):
            raise ValueError(f"unknown sensor type: {sensor}")
        self.config = config
        self.sensor = sensor
        self._build()
        self.loop_closing_enabled = loop_closing
        self.localization_only = False
        # cooperative stop flag (System::RequestStop — set by the viewer's
        # "Stop and Save" menu button, consumed by the front-end loop which
        # exits and saves the trajectory, Viewer.cc:68-84)
        self.stop_requested = False

    def _build(self):
        if self.sensor == RGBD:
            self.tracker = RGBDTracker(self.config)
        else:
            self.tracker = MonoTracker(self.config)
        self.imu = IMUStateEKF() if self.sensor == MONOCULAR_IMU else None
        self.loop_closer = LoopCloser(
            cam=self.config.camera,
            scale_factor=self.config.orb.scale_factor,
            n_levels=self.config.orb.n_levels,
            fix_scale=(self.sensor == RGBD),
        )
        self._last_kf_count = 0

    # ------------------------------------------------------------------
    # frame entry points (System.cc:87-254)
    # ------------------------------------------------------------------

    def track_monocular(self, image, timestamp: float) -> np.ndarray:
        assert self.sensor == MONOCULAR, "system built for another sensor"
        pose = self.tracker.track(image, timestamp)
        self._after_frame()
        return pose

    def track_rgbd(self, image, depth, timestamp: float) -> np.ndarray:
        assert self.sensor == RGBD
        pose = self.tracker.track(image, depth, timestamp)
        self._after_frame()
        return pose

    def track_fusion(self, image, measurements, timestamp: float) -> np.ndarray:
        """Mono+IMU: measurements = [gx, gy, gz, ax, ay, az]
        (Examples/Fusion/monocular_imu.cc:105-145)."""
        assert self.sensor == MONOCULAR_IMU
        m = np.asarray(measurements, float).reshape(-1)
        dt = max(timestamp - self.tracker.st.last_ts, 1e-3)
        # The 16-state EKF cycle (EKF::Predict/Update, Tracking.cc:215-245)
        # runs ON DEVICE inside the fused step: it fuses the CURRENT frame's
        # tracked pose with both raw IMU channels at zero lag (the r2 host
        # filter fused a PIPELINE_DEPTH-stale pose — VERDICT r2 item 4).
        # The raw measurement rides the next frame's dispatch.
        self.tracker.inject_imu(m[:3], m[3:6])
        # host mirror: kept for introspection/API parity (pose(), P); it
        # lags like any host-side view of the async pipeline and is NOT on
        # the tracking path anymore.
        if (
            self.tracker.st.status != "NOT_INITIALIZED"
            and self.tracker.st.T_last is not None
        ):
            self.imu.predict(dt)
            self.imu.update(
                np.asarray(self.tracker.st.T_last), m[:3], m[3:6], dt
            )
        pose = self.tracker.track(image, timestamp)
        self._after_frame()
        return pose

    def _after_frame(self):
        # live-viewer menu actions apply HERE, at the frame boundary, on the
        # thread that owns the tracking loop (the reference's CheckMenu flag
        # pattern; applying them on the HTTP handler thread would race the
        # tracker's async drains)
        lv = getattr(self, "_live_viewer", None)
        if lv is not None:
            lv.apply_pending()
        if self.localization_only:
            return
        # new-KF events surface through the tracker's async readback queue;
        # detection+consistency dispatches WITHOUT host sync and its result
        # drains a couple of keyframes later — loop closing never stalls the
        # frame loop (the reference decouples with the LoopClosing thread,
        # LoopClosing.cc:61-87; verification/correction still run inline on
        # the rare consistency hit)
        if not self.loop_closing_enabled:
            self.tracker.kf_events.clear()
            return
        while self.tracker.kf_events:
            slot = self.tracker.kf_events.pop(0)
            self.loop_closer.dispatch_keyframe(self.tracker.ms, slot)
        self.tracker.ms, infos = self.loop_closer.poll(self.tracker.ms)
        for info in infos:
            if info.get("corrected"):
                # tracking state must follow the corrected map
                self.tracker.reset_reference(info["kf"])

    def finish(self):
        """Drain every in-flight frame AND loop-closing detection (call at
        end of a sequence before reading trajectories/maps)."""
        self.tracker.flush()
        if self.loop_closing_enabled and not self.localization_only:
            self.tracker.ms, infos = self.loop_closer.poll(
                self.tracker.ms, force=True
            )
            for info in infos:
                if info.get("corrected"):
                    self.tracker.reset_reference(info["kf"])

    # ------------------------------------------------------------------
    # modes / reset / state (System.cc:236-276)
    # ------------------------------------------------------------------

    def request_stop(self):
        """Ask the owning front-end loop to stop after the current frame
        and save the trajectory (System::RequestStop; the reference's main
        loops poll StopRequested each iteration, monocular.cc:132-177)."""
        self.stop_requested = True

    def activate_localization_mode(self):
        """Track against the frozen map; no new keyframes or points."""
        self.localization_only = True
        self.tracker.mapping_enabled = False

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.mapping_enabled = True

    def reset(self):
        """System::Reset -> Tracking::Reset (clears map, restarts EKF)."""
        self._build()

    def get_tracking_state(self) -> str:
        self.tracker.flush()
        return self.tracker.st.status

    def map_changed(self) -> int:
        return int(self.tracker.ms.next_kf_id)

    # ------------------------------------------------------------------
    # persistence (System.cc:277-533)
    # ------------------------------------------------------------------

    def save_trajectory_tum(self, path: str):
        """TUM format: timestamp tx ty tz qx qy qz qw (camera-to-world)."""
        self.tracker.flush()
        with open(path, "w") as f:
            for ts, Tcw in zip(
                getattr(self.tracker, "timestamps", range(len(self.tracker.trajectory))),
                self.tracker.trajectory,
            ):
                Twc = np.linalg.inv(Tcw)
                q = np.asarray(lie.mat_to_quat(jnp.asarray(Twc[:3, :3].astype(np.float32))))
                t = Twc[:3, 3]
                f.write(
                    f"{float(ts):.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
                )

    def save_trajectory(self, path: str, folder: str):
        """Reference-format YAML map save (System::SaveTrajectory,
        System.cc:277-384): camera block, per-KF pose + PNG, per-point
        position + pixel observations."""
        from sdslam_tpu.io.map_yaml import save_trajectory_yaml

        save_trajectory_yaml(self, path, folder)

    def load_trajectory(self, path: str) -> bool:
        """Reference-format YAML map load (System::LoadTrajectory,
        System.cc:387-533): re-extracts features from saved images,
        re-links points by pixel, forces relocalization."""
        from sdslam_tpu.io.map_yaml import load_trajectory_yaml

        return load_trajectory_yaml(self, path) > 0

    def save_map(self, path: str):
        """Checkpoint the full array-resident map (npz)."""
        ms = self.tracker.ms
        arrays = {}
        for field, value in ms._asdict().items():
            if field == "kf_pyramid":
                for i, lvl in enumerate(value):
                    arrays[f"kf_pyramid_{i}"] = np.asarray(lvl)
            else:
                arrays[field] = np.asarray(value)
        np.savez_compressed(path, **arrays)

    def load_map(self, path: str):
        """Restore a map checkpoint; the system starts LOST and relocalizes
        against it (LoadTrajectory forces relocalization, System.cc:529)."""
        data = np.load(path)
        pyr = []
        i = 0
        while f"kf_pyramid_{i}" in data:
            pyr.append(jnp.asarray(data[f"kf_pyramid_{i}"]))
            i += 1
        fields = {}
        for field in M.MapState._fields:
            if field == "kf_pyramid":
                fields[field] = tuple(pyr)
            elif field == "loop_edges" and field not in data:
                # checkpoints predating persistent loop edges
                fields[field] = jnp.full((32, 2), -1, jnp.int32)
            else:
                fields[field] = jnp.asarray(data[field])
        self.tracker.flush()
        self.tracker.ms = M.MapState(**fields)
        self.tracker.st.status = "LOST"
        self.tracker.st.T_last = np.eye(4, dtype=np.float32)
        self.tracker.st.last_kf_slot = int(
            np.flatnonzero(np.asarray(self.tracker.ms.kf_valid))[-1]
        )
        self._last_kf_count = int(self.tracker.ms.n_keyframes())

    def shutdown(self):
        """No threads to join (the reference joins LocalMapping/LoopClosing,
        System.cc:256-275); kept for API parity."""
