"""Reference-format trajectory/map YAML save & load.

Byte-level-compatible writer/reader for the reference's map persistence
(System::SaveTrajectory, /root/reference/src/System.cc:277-384 and
System::LoadTrajectory, System.cc:387-533):

  %YAML:1.0
  camera:   {fx, fy, cx, cy, k1, k2, p1, p2, k3}
  keyframes: [{id, filename (PNG), [depthname], pose [qw qx qy qz tx ty tz]}]
  points:   [{id, pose [x y z], observations: [{kf, pixel [x y]}]}]

Poses are WORLD-FROM-CAMERA (the reference saves GetPoseInverse).

Design shifts (documented, not omissions):
  * Keyframes store pyramid levels >= 2 only (direct alignment never reads
    finer levels; storing level 0 would cost ~15x the HBM) — the exported
    PNG is the coarsest stored level upsampled to level-0 size. The
    reference re-extracts ORB from this image on load, which works with
    reduced detail; for full-fidelity restore use SDSlamSystem.save_map
    (npz of the exact array state).
  * RGB-D depth images are not retained per keyframe (only per-keypoint
    depths), so no depth PNG is written; a loaded map supports
    localization-only mode, exactly what the reference's load path is for
    (System.cc:529 forces relocalization against the frozen map).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np


def _fmt(x: float) -> str:
    # std::to_string(double) fixed 6-decimal format (System.cc strings)
    return f"{float(x):.6f}"


def save_trajectory_yaml(system, path: str, folder: str) -> None:
    """Write the reference-schema trajectory YAML + keyframe PNGs."""
    from PIL import Image

    from sdslam_tpu.geometry import lie
    import jax.numpy as jnp

    system.tracker.flush()
    ms = system.tracker.ms
    cam = system.config.camera
    os.makedirs(folder, exist_ok=True)

    out = ["%YAML:1.0", "camera:"]
    for k, v in (
        ("fx", cam.fx), ("fy", cam.fy), ("cx", cam.cx), ("cy", cam.cy),
        ("k1", cam.k1), ("k2", cam.k2), ("p1", cam.p1), ("p2", cam.p2),
        ("k3", cam.k3),
    ):
        out.append(f"  {k}: {_fmt(v)}")

    kf_valid = np.asarray(ms.kf_valid)
    kf_Tcw = np.asarray(ms.kf_Tcw)
    kf_ids = np.asarray(ms.kf_frame_id)
    slots = [int(s) for s in np.flatnonzero(kf_valid)]
    slots.sort(key=lambda s: int(kf_ids[s]))  # sorted by id (KeyFrame::lId)

    out.append("keyframes:")
    coarse = np.asarray(ms.kf_pyramid[0])  # coarsest stored level pool
    H0, W0 = cam.height, cam.width
    for s in slots:
        kid = int(kf_ids[s])
        img = coarse[s]
        pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        pil = pil.resize((W0, H0), Image.BILINEAR)
        imgname = os.path.join(folder, f"{kid}.png")
        pil.save(imgname)
        Twc = np.linalg.inv(kf_Tcw[s])
        q = np.asarray(lie.mat_to_quat(jnp.asarray(Twc[:3, :3], jnp.float32)))
        t = Twc[:3, 3]
        out.append(f"  - id: {kid}")
        out.append(f'    filename: "{imgname}"')
        out.append("    pose:")
        for v in (q[0], q[1], q[2], q[3], t[0], t[1], t[2]):
            out.append(f"      - {_fmt(v)}")

    out.append("points:")
    pt_valid = np.asarray(ms.pt_valid)
    pt_pos = np.asarray(ms.pt_pos)
    kf_mp = np.asarray(ms.kf_mp)
    kf_uv = np.asarray(ms.kf_uv)
    # observations per point from the association table
    obs_by_pt: dict = {}
    for s in slots:
        row = kf_mp[s]
        bound = np.flatnonzero(row >= 0)
        for n in bound:
            obs_by_pt.setdefault(int(row[n]), []).append((int(kf_ids[s]), kf_uv[s, n]))
    counter = 0
    for p in np.flatnonzero(pt_valid):
        obs = obs_by_pt.get(int(p), [])
        out.append(f"  - id: {counter}")
        out.append("    pose:")
        for v in pt_pos[p]:
            out.append(f"      - {_fmt(v)}")
        out.append("    observations:")
        for kid, uv in obs:
            out.append(f"      - kf: {kid}")
            out.append("        pixel:")
            out.append(f"          - {_fmt(uv[0])}")
            out.append(f"          - {_fmt(uv[1])}")
        counter += 1

    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def load_trajectory_yaml(system, path: str, pixel_tol: float = 2.0) -> int:
    """Rebuild the map from a reference-schema YAML (System::LoadTrajectory):
    re-extract ORB on each saved image, re-create keyframes with their saved
    poses/ids, re-link map points by matching saved pixels to the nearest
    re-extracted keypoint (KeyFrame::AddMapPoint(pos), KeyFrame.cc:201-221),
    recompute statistics, and force relocalization (System.cc:529).

    Returns the number of keyframes restored."""
    import yaml
    import jax.numpy as jnp

    from sdslam_tpu.features.frame import make_frame
    from sdslam_tpu.geometry import lie
    from sdslam_tpu.io.datasets import _load_image as load_gray
    from sdslam_tpu.mapping import map_state as M
    from sdslam_tpu.pipeline.tracking import keyframe_step

    text = open(path).read()
    text = re.sub(r"^%YAML.*$|^---.*$", "", text, flags=re.MULTILINE)
    data = yaml.safe_load(text)

    tracker = system.tracker
    tracker.flush()
    cfg = system.config
    # fresh map
    tracker.ms = M.init_map(
        cfg.map.max_keyframes,
        cfg.map.max_points,
        cfg.orb.max_keypoints,
        tuple(lvl.shape[1:] for lvl in tracker.ms.kf_pyramid),
    )
    ms = tracker.ms

    kfs = data.get("keyframes") or []
    slot_by_id = {}
    kp_uv_by_id = {}
    for slot, kf in enumerate(kfs[: ms.K]):
        kid = int(kf["id"])
        img = load_gray(kf["filename"])
        frame = make_frame(tracker.extractor, img)
        q = np.array(kf["pose"][:4], np.float64)  # [w,x,y,z]
        t = np.array(kf["pose"][4:7], np.float64)
        Rwc = np.asarray(lie.quat_to_mat(jnp.asarray(q, jnp.float32)))
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = t
        Tcw = np.linalg.inv(Twc).astype(np.float32)
        f = frame.features
        ms = keyframe_step(
            cfg.camera, ms, jnp.asarray(slot), jnp.asarray(Tcw),
            f.uv, f.uv_und, f.octave, f.angle, f.desc, f.valid,
            frame.depth, frame.uright,
            jnp.full((f.capacity,), -1, jnp.int32),
            tracker._stored_pyr(frame),
            jnp.asarray(kid, jnp.int32), jnp.asarray(0.0, jnp.float32),
            jnp.asarray(-1, jnp.int32),
            scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        )
        slot_by_id[kid] = slot
        kp_uv_by_id[kid] = (np.asarray(f.uv), np.asarray(f.valid))

    # points + observation relinking by pixel distance
    pts = data.get("points") or []
    kf_mp = np.asarray(ms.kf_mp).copy()
    pt_pos = np.asarray(ms.pt_pos).copy()
    pt_valid = np.asarray(ms.pt_valid).copy()
    n_pts = 0
    for p in pts[: ms.P]:
        pos = np.array(p["pose"][:3], np.float32)
        linked = False
        for ob in p.get("observations") or []:
            kid = int(ob["kf"])
            if kid not in slot_by_id:
                continue
            uv, valid = kp_uv_by_id[kid]
            px = np.array(ob["pixel"][:2], np.float32)
            d2 = np.sum((uv - px) ** 2, axis=1)
            d2[~valid] = np.inf
            j = int(np.argmin(d2))
            if d2[j] <= pixel_tol**2:
                kf_mp[slot_by_id[kid], j] = n_pts
                linked = True
        if linked:
            pt_pos[n_pts] = pos
            pt_valid[n_pts] = True
            n_pts += 1

    ms = ms._replace(
        kf_mp=jnp.asarray(kf_mp),
        pt_pos=jnp.asarray(pt_pos),
        pt_valid=jnp.asarray(pt_valid),
        next_pt_id=jnp.asarray(n_pts, jnp.int32),
    )
    ms = M.finalize_point_statistics(ms, cfg.orb.scale_factor, cfg.orb.n_levels)
    tracker.ms = ms
    # forced relocalization against the frozen map (System.cc:529)
    tracker.st.status = "LOST"
    tracker.st.T_last = jnp.eye(4)
    if slot_by_id:
        tracker.st.last_kf_slot = max(slot_by_id.values())
    system._last_kf_count = len(slot_by_id)
    return len(slot_by_id)
