"""Map-state unit tests: allocation, derived structures, mutation ops."""

import numpy as np
import jax.numpy as jnp

from sdslam_tpu.mapping import map_state as M


def small_map(K=8, P=64, N=16):
    return M.init_map(K, P, N, ((10, 12), (5, 6)))


def test_allocate_slots_basic():
    valid = jnp.asarray([True, False, True, False, False])
    want = jnp.asarray([True, True, False, True])
    slots = np.asarray(M.allocate_slots(valid, want))
    # wants 0,1,3 get free slots 1,3,4 in order; non-want gets -1
    np.testing.assert_array_equal(slots, [1, 3, -1, 4])


def test_allocate_slots_exhaustion():
    valid = jnp.asarray([True, True, False])
    want = jnp.asarray([True, True, True])
    slots = np.asarray(M.allocate_slots(valid, want))
    assert slots[0] == 2 and (slots[1:] == -1).all()


def _populate(ms, rng):
    """3 KFs; KF0/KF1 share points 0..9, KF1/KF2 share 10..14."""
    K, P, N = ms.K, ms.P, ms.N
    kf_valid = ms.kf_valid.at[:3].set(True)
    kp_valid = ms.kf_kp_valid.at[:3].set(True)
    kf_mp = np.full((K, N), -1, np.int32)
    kf_mp[0, :10] = np.arange(10)
    kf_mp[1, :10] = np.arange(10)
    kf_mp[1, 10:15] = np.arange(10, 15)
    kf_mp[2, 3:8] = np.arange(10, 15)
    pt_valid = ms.pt_valid.at[:15].set(True)
    desc = jnp.asarray(
        rng.integers(0, 2**32, size=(K, N, 8), dtype=np.uint64).astype(np.uint32)
    )
    pos = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32) + np.array([0, 0, 3]))
    return ms._replace(
        kf_valid=kf_valid,
        kf_kp_valid=kp_valid,
        kf_mp=jnp.asarray(kf_mp),
        pt_valid=pt_valid,
        kf_desc=desc,
        pt_pos=pos,
    )


def test_covisibility_and_counts(rng):
    ms = _populate(small_map(), rng)
    cov = np.asarray(M.covisibility(ms))
    assert cov[0, 1] == 10 and cov[1, 0] == 10
    assert cov[1, 2] == 5 and cov[2, 1] == 5
    assert cov[0, 2] == 0
    assert (np.diag(cov) == 0).all()

    cnt = np.asarray(M.point_obs_count(ms))
    np.testing.assert_array_equal(cnt[:10], 2)
    np.testing.assert_array_equal(cnt[10:15], 2)
    assert (cnt[15:] == 0).all()


def test_build_obs_lists(rng):
    ms = _populate(small_map(), rng)
    obs_kf, obs_kp = M.build_obs_lists(ms, max_obs=4)
    obs_kf = np.asarray(obs_kf)
    obs_kp = np.asarray(obs_kp)
    # point 0 observed by KF0 kp0 and KF1 kp0
    assert set(obs_kf[0][obs_kf[0] >= 0]) == {0, 1}
    # point 12 observed by KF1 kp12 and KF2 kp5
    o = {(k, p) for k, p in zip(obs_kf[12], obs_kp[12]) if k >= 0}
    assert o == {(1, 12), (2, 5)}
    # invalid points have no observations
    assert (obs_kf[20] == -1).all()


def test_finalize_point_statistics(rng):
    ms = _populate(small_map(), rng)
    ms2 = M.finalize_point_statistics(ms, 2.0, 5)
    # representative descriptor comes from one of the observations
    d = np.asarray(ms2.pt_desc[0])
    cand = [np.asarray(ms.kf_desc[0, 0]), np.asarray(ms.kf_desc[1, 0])]
    assert any((d == c).all() for c in cand)
    # normals are unit for observed points
    n = np.asarray(ms2.pt_normal[:15])
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
    # scale band sane
    assert (np.asarray(ms2.pt_max_dist[:15]) > 0).all()
    assert (
        np.asarray(ms2.pt_min_dist[:15]) <= np.asarray(ms2.pt_max_dist[:15])
    ).all()


def test_remove_points_scrubs_keyframes(rng):
    ms = _populate(small_map(), rng)
    kill = jnp.zeros((ms.P,), bool).at[5].set(True)
    ms2 = M.remove_points(ms, kill)
    assert not bool(ms2.pt_valid[5])
    assert (np.asarray(ms2.kf_mp) != 5).all()
    # other points untouched
    assert bool(ms2.pt_valid[4])
    assert (np.asarray(ms2.kf_mp[0]) == 4).any()


def test_remove_keyframes(rng):
    ms = _populate(small_map(), rng)
    kill = jnp.zeros((ms.K,), bool).at[1].set(True)
    ms2 = M.remove_keyframes(ms, kill)
    assert not bool(ms2.kf_valid[1])
    cnt = np.asarray(M.point_obs_count(ms2))
    np.testing.assert_array_equal(cnt[:10], 1)  # lost KF1's observations
    cov = np.asarray(M.covisibility(ms2))
    assert cov[1].sum() == 0


def test_remove_keyframes_reparents_children(rng):
    """Culling a mid-tree KF must not leave children pointing at a dead
    slot (KeyFrame::SetBadFlag, KeyFrame.cc:430-508): the child is
    re-parented to its best covisible surviving KF with an earlier frame
    id, and points anchored to the dead KF get a surviving reference."""
    ms = _populate(small_map(), rng)
    # tree: 0 <- 1 <- 2; frame ids 0,1,2
    ms = ms._replace(
        kf_parent=ms.kf_parent.at[1].set(0).at[2].set(1),
        kf_frame_id=ms.kf_frame_id.at[1].set(1).at[2].set(2),
        pt_ref_kf=ms.pt_ref_kf.at[:15].set(1),  # all points anchored to KF1
    )
    kill = jnp.zeros((ms.K,), bool).at[1].set(True)
    ms2 = M.remove_keyframes(ms, kill)
    # KF2's best surviving earlier covisible is KF0? KF2 shares no points
    # with KF0 -> falls back to the culled KF's own parent (0)
    assert int(ms2.kf_parent[2]) == 0
    # point refs moved off the dead slot to a surviving observer
    ref = np.asarray(ms2.pt_ref_kf[:15])
    assert (ref != 1).all()
    assert set(ref.tolist()) <= {0, 2}

    # now with covisibility: make KF2 share points with KF0 too
    ms3 = _populate(small_map(), rng)
    kf_mp = np.array(ms3.kf_mp)
    kf_mp[2, 8:12] = np.arange(4)  # KF2 also sees points 0-3 (KF0's)
    ms3 = ms3._replace(
        kf_mp=jnp.asarray(kf_mp),
        kf_parent=ms3.kf_parent.at[1].set(0).at[2].set(1),
        kf_frame_id=ms3.kf_frame_id.at[1].set(1).at[2].set(2),
    )
    ms4 = M.remove_keyframes(ms3, jnp.zeros((ms3.K,), bool).at[1].set(True))
    assert int(ms4.kf_parent[2]) == 0  # best covisible survivor


def test_loop_edges_add_and_cull(rng):
    ms = _populate(small_map(), rng)
    ms = M.add_loop_edge(ms, 2, 0)
    le = np.asarray(ms.loop_edges)
    assert (le[0] == [2, 0]).all()
    ms = M.add_loop_edge(ms, 1, 0)
    assert (np.asarray(ms.loop_edges)[1] == [1, 0]).all()
    # culling an endpoint drops its edge, keeps the other
    ms2 = M.remove_keyframes(ms, jnp.zeros((ms.K,), bool).at[2].set(True))
    le = np.asarray(ms2.loop_edges)
    assert (le[0] == [-1, -1]).all()
    assert (le[1] == [1, 0]).all()


def test_replace_points(rng):
    ms = _populate(small_map(), rng)
    rep = jnp.full((ms.P,), -1, jnp.int32).at[3].set(4)  # fuse 3 -> 4
    ms2 = M.replace_points(ms, rep)
    assert not bool(ms2.pt_valid[3])
    kf_mp = np.asarray(ms2.kf_mp)
    assert (kf_mp != 3).all()
    # KF0 kp3 and KF1 kp3 now observe point 4
    assert kf_mp[0, 3] == 4 and kf_mp[1, 3] == 4


def test_create_points_and_slot_reuse(rng):
    ms = _populate(small_map(), rng)
    # kill 2 points, then create 3 new ones on KF0 -> reuses freed slots
    ms = M.remove_points(ms, jnp.zeros((ms.P,), bool).at[1].set(True).at[7].set(True))
    want = jnp.zeros((ms.N,), bool).at[10].set(True).at[11].set(True).at[12].set(True)
    pos = jnp.asarray(rng.normal(size=(ms.N, 3)).astype(np.float32))
    ms2, ids = M.create_points(ms, jnp.asarray(0), want, pos)
    ids = np.asarray(ids)
    got = ids[ids >= 0]
    assert len(got) == 3
    assert 1 in got and 7 in got  # freed slots reused first
    kf_mp = np.asarray(ms2.kf_mp[0])
    np.testing.assert_array_equal(kf_mp[[10, 11, 12]], got)
    assert int(ms2.next_pt_id) == int(ms.next_pt_id) + 3
