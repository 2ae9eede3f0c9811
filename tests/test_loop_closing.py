"""Loop closing: detection, Sim3 verification, and correction on a tracked
map with injected drift."""

import copy

import numpy as np
import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import lie
from sdslam_tpu.geometry.camera import CameraModel
from sdslam_tpu.io.synthetic import SyntheticSequence
from sdslam_tpu.mapping import map_state as M
from sdslam_tpu.pipeline import loop_closing as LC
from sdslam_tpu.pipeline.tracking import RGBDTracker, keyframe_step
from sdslam_tpu.utils.config import MapConfig, ORBConfig, SystemConfig

CAM = CameraModel(
    fx=320.0, fy=320.0, cx=159.5, cy=119.5, width=320, height=240, bf=32.0
)


def build_tracked_map(n=14):
    cfg = SystemConfig(
        camera=CAM,
        orb=ORBConfig(max_keypoints=512, n_levels=4),
        map=MapConfig(max_keyframes=32, max_points=4096, max_kps_per_frame=512),
    )
    seq = SyntheticSequence(CAM, n_frames=n, trajectory="orbit", radius=0.06, yaw_amp=0.04)
    t = RGBDTracker(cfg)
    for i in range(n):
        ts, img, depth = seq.frame(i)
        t.track(img, depth, ts)
    assert t.st.status == "OK"
    return t, seq, cfg


def _insert_revisit_kf(t, seq, cfg, frame_idx, pose, fake_frame_id):
    """Insert a keyframe observing seq[frame_idx] with an (optionally wrong)
    pose and a frame id far in the future (per the loop frame-gap rule)."""
    from sdslam_tpu.features.frame import make_frame

    ts, img, depth = seq.frame(frame_idx)
    fr = make_frame(t.extractor, img, depth_img=depth)
    f = fr.features
    slot = t._free_kf_slot()
    # associate nothing: this KF is 'new territory' as far as matching went
    assoc = jnp.full((f.capacity,), -1, jnp.int32)
    t.ms = keyframe_step(
        t.cam, t.ms, slot, jnp.asarray(pose),
        f.uv, f.uv_und, f.octave, f.angle, f.desc, f.valid,
        fr.depth, fr.uright, assoc, t._stored_pyr(fr),
        jnp.asarray(fake_frame_id, jnp.int32), jnp.asarray(99.0, jnp.float32),
        jnp.asarray(t.st.last_kf_slot, jnp.int32),
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
    )
    from sdslam_tpu.pipeline.tracking import spawn_points

    t.ms = spawn_points(
        t.cam, t.ms, jnp.asarray(slot), jnp.asarray(t.close_depth, jnp.float32),
        scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
    )
    return slot


def test_detect_and_verify_loop():
    t, seq, cfg = build_tracked_map()
    # revisit the start viewpoint with a drifted pose far in the 'future'
    drift = np.asarray(
        lie.se3_exp(jnp.asarray(np.array([0.05, -0.03, 0.04, 0.01, -0.02, 0.01], np.float32)))
    )
    true_pose = np.asarray(seq.poses[0]).astype(np.float32)
    wrong_pose = drift @ true_pose
    slot = _insert_revisit_kf(t, seq, cfg, 0, wrong_pose, fake_frame_id=500)

    covis = M.covisibility(t.ms)
    cand = LC.detect_loop_candidates(
        t.cam, t.ms, jnp.asarray(slot), covis,
        scale_factor=2.0, n_levels=4, min_frame_gap=50,
    )
    assert bool(cand.found)
    cand_slot = int(cand.cand_kf)
    # the detected keyframe must be one that saw the start of the orbit
    assert int(t.ms.kf_frame_id[cand_slot]) <= 4

    ver = LC.verify_loop_sim3(
        t.cam, t.ms, jnp.asarray(slot), jnp.asarray(cand_slot),
        jax.random.key(0), scale_factor=2.0, fix_scale=True,
    )
    assert bool(ver.accepted)
    assert int(ver.n_inliers) >= 20

    # verified Sim3 implies a corrected pose close to ground truth
    T_corr = np.asarray(ver.S_cur_cand @ t.ms.kf_Tcw[cand_slot])
    e = np.asarray(lie.se3_log(jnp.asarray(T_corr @ np.linalg.inv(true_pose))))
    assert np.abs(e[:3]).max() < 0.02

    # full correction shrinks the revisit keyframe's pose error
    before = np.abs(np.asarray(lie.se3_log(jnp.asarray(
        np.asarray(t.ms.kf_Tcw[slot]) @ np.linalg.inv(true_pose)))))[:3].max()
    ms2, _ = LC.correct_loop_poses(
        t.ms, jnp.asarray(slot), jnp.asarray(cand_slot), ver.S_cur_cand, covis,
    )
    # the closure is remembered as a persistent loop edge (KeyFrame.cc:401)
    le = np.asarray(ms2.loop_edges)
    assert ((le[:, 0] == slot) & (le[:, 1] == cand_slot)).any()
    after = np.abs(np.asarray(lie.se3_log(jnp.asarray(
        np.asarray(ms2.kf_Tcw[slot]) @ np.linalg.inv(true_pose)))))[:3].max()
    assert after < before * 0.4, (before, after)


def test_no_false_loop_on_novel_view():
    t, seq, cfg = build_tracked_map(n=10)
    other = SyntheticSequence(CAM, n_frames=2, seed=11)
    slot = None
    # insert a KF from an unrelated scene
    from sdslam_tpu.features.frame import make_frame
    ts, img, depth = other.frame(0)
    fr = make_frame(t.extractor, img, depth_img=depth)
    f = fr.features
    slot = t._free_kf_slot()
    t.ms = keyframe_step(
        t.cam, t.ms, slot, jnp.eye(4),
        f.uv, f.uv_und, f.octave, f.angle, f.desc, f.valid,
        fr.depth, fr.uright, jnp.full((f.capacity,), -1, jnp.int32),
        t._stored_pyr(fr),
        jnp.asarray(500, jnp.int32), jnp.asarray(99.0, jnp.float32),
        jnp.asarray(-1, jnp.int32), scale_factor=2.0, n_levels=4,
    )
    covis = M.covisibility(t.ms)
    cand = LC.detect_loop_candidates(
        t.cam, t.ms, jnp.asarray(slot), covis,
        scale_factor=2.0, n_levels=4, min_frame_gap=50,
    )
    assert not bool(cand.found)


def test_fuse_loop_points_merges_seam_duplicates():
    """SearchAndFuse semantics (LoopClosing.cc:535-557 /
    ORBmatcher.cc:617-732): after a loop correction aligns the two sides,
    landmarks duplicated across the seam (same physical point, two pool
    entries) must MERGE, with the loop-side point replacing the
    current-side one unconditionally."""
    t, seq, cfg = build_tracked_map(n=8)
    # revisit KF at the TRUE pose (post-correction state): its spawn_points
    # creates fresh pool entries duplicating the originals seen at frame 0
    slot = _insert_revisit_kf(
        t, seq, cfg, 0, np.asarray(seq.poses[0]).astype(np.float32),
        fake_frame_id=500,
    )
    ms = t.ms
    covis = M.covisibility(ms)
    # the revisit KF duplicates frame-0 landmarks: it shares no pool ids
    # with the early keyframes (assoc=-1 at insertion)
    cand = 0  # earliest keyframe = the loop side
    n_pts_before = int(np.asarray(ms.pt_valid).sum())
    row_before = np.asarray(ms.kf_mp[slot])
    hood_before = set(
        int(p) for p in np.asarray(ms.kf_mp[cand]) if p >= 0
    )
    assert not (set(row_before[row_before >= 0].tolist()) & hood_before)

    ms2 = LC.fuse_loop_points(
        t.cam, ms, jnp.asarray(slot), jnp.asarray(cand), covis,
        scale_factor=2.0,
    )
    row_after = np.asarray(ms2.kf_mp[slot])
    n_pts_after = int(np.asarray(ms2.pt_valid).sum())
    # loop-side ids now appear in the revisit KF's bindings ...
    n_loop_bound = len(set(row_after[row_after >= 0].tolist()) & hood_before)
    assert n_loop_bound > 30, n_loop_bound
    # ... and the replaced duplicates were invalidated (pool shrank)
    assert n_pts_after < n_pts_before - 30, (n_pts_before, n_pts_after)
    # replaced duplicates are gone from every keyframe row
    killed = np.flatnonzero(
        np.asarray(ms.pt_valid) & ~np.asarray(ms2.pt_valid)
    )
    mp_after = np.asarray(ms2.kf_mp)
    assert not np.isin(mp_after[mp_after >= 0], killed).any()


def test_async_loop_closer_consistency_chain():
    """The full async orchestration (dispatch_keyframe / poll): three
    consecutive revisit keyframes build the on-device consistency chain
    (th=3, LoopClosing.cc:49), detections drain a couple of keyframes late,
    and the third consistent detection triggers verification + correction
    (the reference's decoupled-thread behavior re-expressed as the async
    result queue)."""
    t, seq, cfg = build_tracked_map()
    drift = np.asarray(
        lie.se3_exp(jnp.asarray(
            np.array([0.05, -0.03, 0.04, 0.01, -0.02, 0.01], np.float32)))
    )
    closer = LC.LoopCloser(
        cam=t.cam, scale_factor=2.0, n_levels=4, fix_scale=True,
        run_gba=False, min_frame_gap=50,
    )
    true_pose0 = np.asarray(seq.poses[0]).astype(np.float32)
    slots = []
    for k, fidx in enumerate((0, 1, 0)):
        wrong = drift @ np.asarray(seq.poses[fidx]).astype(np.float32)
        slot = _insert_revisit_kf(t, seq, cfg, fidx, wrong,
                                  fake_frame_id=500 + 10 * k)
        slots.append(slot)
        closer.dispatch_keyframe(t.ms, slot)
    # nothing forced yet: pending detections may or may not have drained
    t.ms, infos = closer.poll(t.ms, force=True)
    # infos = 3 detection entries + the async verification drain entries
    # (verification is dispatched async on the consistency hit and its
    # result drains as its own info — VERDICT r2 item 6)
    detections = [i for i in infos if "detected" in i]
    assert len(detections) + len(closer._pending) == 3
    hit = [i for i in detections if i.get("verifying")]
    assert hit, infos  # the third consistent detection dispatched a verify
    corrected = [i for i in infos if i.get("corrected")]
    assert corrected, infos
    assert corrected[0]["kf"] == slots[2]
    # the revisit keyframe's pose error shrank toward ground truth
    after = np.abs(np.asarray(lie.se3_log(jnp.asarray(
        np.asarray(t.ms.kf_Tcw[slots[2]]) @ np.linalg.inv(true_pose0)
    ))))[:3].max()
    before = np.abs(np.asarray(lie.se3_log(jnp.asarray(
        drift.astype(np.float32)))))[:3].max()
    assert after < before * 0.5, (before, after)
    # persistent loop edge recorded
    le = np.asarray(t.ms.loop_edges)
    assert (le[:, 0] == slots[2]).any()
