"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; compiled path exercised on TPU by the bench)."""

import functools
import numpy as np
import jax
import jax.numpy as jnp

from sdslam_tpu.ops import hamming as ham
from sdslam_tpu.ops.pallas import align_kernel, hamming_kernel


def test_hamming_kernel_matches_xla(rng):
    a = jnp.asarray(rng.integers(0, 2**32, size=(200, 8), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, size=(150, 8), dtype=np.uint64).astype(np.uint32))
    ref = np.asarray(ham.hamming_matrix(a, b))
    out = np.asarray(hamming_kernel.hamming_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_align_kernel_matches_xla(rng):
    from sdslam_tpu.ops import interp

    H, W = 120, 160
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    N = 200
    fx = fy = 80.0
    cx, cy = 79.5, 59.5
    Xc = rng.uniform([-0.8, -0.6, 1.0], [0.8, 0.6, 3.0], size=(N, 3)).astype(np.float32)
    patch = rng.uniform(0, 255, (N, 16)).astype(np.float32)
    J = rng.normal(size=(N, 16, 6)).astype(np.float32) * 0.01
    valid = rng.uniform(size=N) > 0.2
    okpx = valid[:, None] & (rng.uniform(size=(N, 16)) > 0.1)

    b, chi, n = align_kernel.accumulate_gn(
        img, jnp.asarray(Xc), jnp.asarray(patch), jnp.asarray(J),
        jnp.asarray(okpx), fx, fy, cx, cy, interpret=True,
    )

    # XLA reference (mirrors solvers/image_align residual math, including
    # patch ordering dy-outer/dx-inner — _patch_offsets meshgrid order)
    z = Xc[:, 2]
    u = fx * Xc[:, 0] / np.maximum(z, 1e-6) + cx
    v = fy * Xc[:, 1] / np.maximum(z, 1e-6) + cy
    d = np.arange(16)
    dx = (d % 4) - 2.0
    dy = (d // 4) - 2.0
    uv = np.stack([u[:, None] + dx, v[:, None] + dy], -1).astype(np.float32)
    cur, ok = interp.bilinear_sample(img, jnp.asarray(uv))
    m = np.asarray(ok) & okpx & (z > 0.01)[:, None]
    r = np.where(m, (np.asarray(cur) - patch) / 255.0, 0.0)
    Jm = np.where(m[:, :, None], J, 0.0)
    b_ref = np.einsum("tpi,tp->i", Jm, r)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(chi), (r * r).sum(), rtol=1e-3)
    assert int(n) == int(m.sum())


def test_ba_edge_kernel_matches_xla_gn():
    """The fused BA edge kernel (interpret mode) must reproduce the XLA
    fallback's GN step outputs on a random BA problem."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ba import CAM, make_ba_problem

    from sdslam_tpu.mapping import map_state as M
    from sdslam_tpu.solvers import ba

    # own deterministic generator: the session rng's state (and thus the
    # problem conditioning) would depend on test order, and the post-solve
    # comparison tolerance is conditioning-sensitive
    rng = np.random.default_rng(7)
    ms, T_gt, X_gt, n_kf, n_pt = make_ba_problem(rng, noise_px=0.5, stereo=True)
    obs_kf, obs_kp = M.build_obs_lists(ms, 16)
    obs_ok = obs_kf >= 0
    es = ba._prep_edges(
        obs_kf, obs_kp, ms.kf_uv_und, ms.kf_uright, ms.kf_octave, 2.0, ms.K
    )
    cam_active = ms.kf_valid.at[0].set(False)

    # force each path through the module gate
    ba._EDGE_KERNEL = False
    T_x, X_x, c_x = ba._gn_iteration(
        CAM, ms.kf_Tcw, ms.pt_pos, es, obs_ok, cam_active, ms.pt_valid,
        2.0, True, 1e-4,
    )
    orig_terms = ba.bak.ba_edge_terms
    ba.bak.ba_edge_terms = functools.partial(orig_terms, interpret=True)
    ba._EDGE_KERNEL = True
    try:
        T_p, X_p, c_p = ba._gn_iteration(
            CAM, ms.kf_Tcw, ms.pt_pos, es, obs_ok, cam_active, ms.pt_valid,
            2.0, True, 1e-4,
        )
    finally:
        ba.bak.ba_edge_terms = orig_terms
        ba._EDGE_KERNEL = None

    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(X_p), np.asarray(X_x), atol=5e-5)
