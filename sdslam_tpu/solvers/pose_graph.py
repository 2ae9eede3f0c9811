"""Sim(3) pose-graph (essential-graph) optimization.

Replaces Optimizer::OptimizeEssentialGraph (Optimizer.cc:717-956): Sim3
vertices for every keyframe (7 DoF monocular / 6 DoF with fixed scale for
RGB-D, `_fix_scale`), edges from loop connections, the spanning tree,
previous loop edges and strong covisibility (>= 100 shared points), the loop
keyframe fixed, ~20 LM iterations, then SE3 recovery [R, t/s] and map-point
correction through each point's reference keyframe.

TPU formulation: edges live in fixed-capacity arrays [E] with masks; each GN
iteration evaluates every edge residual r = log_sim3(S_meas_ij * S_j *
S_i^-1) in one batch, assembles the dense [7K, 7K] system with one one-hot
einsum (MXU), solves by Cholesky, and updates S_i <- exp(d_i) * S_i.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sdslam_tpu.geometry import lie


class PoseGraphEdges(NamedTuple):
    i: jnp.ndarray  # [E] int32 source keyframe slot
    j: jnp.ndarray  # [E] int32 target keyframe slot
    S_ij: jnp.ndarray  # [E,4,4] measured relative sim3: S_i * S_j^-1
    weight: jnp.ndarray  # [E] float32 (0 disables an edge)


def make_edges_from_covisibility(
    kf_Tcw,
    kf_valid,
    covis,
    parent,
    loop_i=None,
    loop_j=None,
    loop_S=None,
    stored_loops=None,  # [L,2] persistent loop edges (MapState.loop_edges)
    covis_min: int = 100,
    max_edges: int = 2048,
):
    """Build the essential-graph edge set from current poses (measurements
    are the CURRENT relative transforms, as in the reference, which
    constructs edges from poses before correction).

    Edge classes in priority order under the `max_edges` cap (the
    reference has no cap — it materializes every edge, Optimizer.cc:829-904;
    here connectivity-critical classes must never be displaced by bulk
    covisibility):
      3: stored loop edges from previous closures (Optimizer.cc:853-874)
      2: spanning-tree edges (Optimizer.cc:829-850)
      1: strong covisibility (>= covis_min shared, Optimizer.cc:877-904)
    The fresh loop edge of the in-flight correction (loop_i/j/S) is
    prepended outside the cap competition.

    Returns (edges, n_dropped) — n_dropped > 0 means covisibility edges were
    truncated (callers must log it: no silent caps)."""
    K = kf_Tcw.shape[0]
    ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
    upper = ii < jj
    cov_ok = (covis >= covis_min) & upper & kf_valid[:, None] & kf_valid[None, :]
    # spanning-tree edges
    ks = jnp.arange(K)
    par_ok = (parent >= 0) & kf_valid
    tree = jnp.zeros((K, K), bool)
    tree = tree.at[jnp.where(par_ok, jnp.minimum(ks, parent), K),
                   jnp.where(par_ok, jnp.maximum(ks, parent), K)].set(
        True, mode="drop"
    )
    pri = cov_ok.astype(jnp.int32) + 2 * tree.astype(jnp.int32)
    if stored_loops is not None:
        li, lj = stored_loops[:, 0], stored_loops[:, 1]
        ok = (li >= 0) & (lj >= 0) & kf_valid[jnp.clip(li, 0, K - 1)] & (
            kf_valid[jnp.clip(lj, 0, K - 1)]
        )
        a = jnp.where(ok, jnp.minimum(li, lj), K)
        b = jnp.where(ok, jnp.maximum(li, lj), K)
        pri = pri.at[a, b].max(3, mode="drop")
    flat = pri.ravel()
    order = jnp.argsort(-flat)  # highest priority first (stable)
    sel = order[:max_edges]
    ei = (sel // K).astype(jnp.int32)
    ej = (sel % K).astype(jnp.int32)
    w = (flat[sel] > 0).astype(jnp.float32)
    n_dropped = jnp.sum(flat > 0) - jnp.sum(w > 0).astype(jnp.int32)
    S_i = kf_Tcw[ei]
    S_j = kf_Tcw[ej]
    S_ij = S_i @ lie.sim3_inv(S_j)
    if loop_i is not None:
        ei = jnp.concatenate([loop_i, ei[: max_edges - loop_i.shape[0]]])
        ej = jnp.concatenate([loop_j, ej[: max_edges - loop_i.shape[0]]])
        S_ij = jnp.concatenate([loop_S, S_ij[: max_edges - loop_i.shape[0]]])
        w = jnp.concatenate(
            [jnp.ones((loop_i.shape[0],), jnp.float32) * 5.0,
             w[: max_edges - loop_i.shape[0]]]
        )
    return PoseGraphEdges(ei, ej, S_ij, w), n_dropped


def edge_system(S_all, edges: PoseGraphEdges, K: int, fix_scale: bool):
    """Assemble the GN normal equations of an edge set: returns
    (H [K*7, K*7], b [K*7]) WITHOUT damping/prior — the shard-local building
    block shared by the single-device optimizer and the distributed one
    (parallel/dist_pose_graph.py psums these over an edge-sharded mesh)."""
    D = 7

    def residuals(S_all):
        Si = S_all[edges.i]
        Sj = S_all[edges.j]
        # r = log( S_meas_ij * S_j * S_i^-1 )  [E,7]
        return lie.sim3_log(edges.S_ij @ Sj @ lie.sim3_inv(Si))

    def jac_fd(S_all):
        """Numerical Jacobians wrt left-perturbation of S_i and S_j.

        The sim3 adjoint chain is small (7x7 per edge); finite differences
        on the 7-dim tangent are exact enough in f32 and keep the code
        simple; each edge needs 14 perturbed evaluations, all batched."""
        eps = 1e-4
        r0 = residuals(S_all)

        def pert(which, d):
            delta = jnp.zeros((D,)).at[d].set(eps)
            Sd = lie.sim3_exp(delta)
            Si = S_all[edges.i]
            Sj = S_all[edges.j]
            if which == 0:
                Si = jnp.einsum("ij,ejk->eik", Sd, Si)
            else:
                Sj = jnp.einsum("ij,ejk->eik", Sd, Sj)
            r = lie.sim3_log(edges.S_ij @ Sj @ lie.sim3_inv(Si))
            return (r - r0) / eps

        Ji = jnp.stack([pert(0, d) for d in range(D)], axis=-1)  # [E,7,7]
        Jj = jnp.stack([pert(1, d) for d in range(D)], axis=-1)
        return r0, Ji, Jj

    hp = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    Ui = (edges.i[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32) * edges.weight[:, None]
    Uj = (edges.j[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32) * edges.weight[:, None]
    r, Ji, Jj = jac_fd(S_all)
    if fix_scale:
        # 6-DoF mode: zero the scale tangent (RGB-D, Optimizer.cc:770)
        scale_mask = jnp.ones((D,)).at[6].set(0.0)
        Ji = Ji * scale_mask[None, :, None] * scale_mask[None, None, :]
        Jj = Jj * scale_mask[None, :, None] * scale_mask[None, None, :]
        r = r * scale_mask[None, :]
    # assemble H [K,7,K,7] via one-hot einsums (no scatters)
    JiU = hp("ek,erd->kerd", Ui, Ji)  # prescaled by weight
    JjU = hp("ek,erd->kerd", Uj, Jj)
    Jall = JiU + JjU  # [K,E,7,7] sparse-by-construction
    H = hp("kera,lerb->kalb", Jall, Jall)
    b = -hp("kera,er->ka", Jall, r)
    return H.reshape(K * D, K * D), b.reshape(K * D)


def solve_and_update(S_all, H, b, kf_valid, fixed_mask, fix_scale: bool,
                     lm_lambda: float):
    """Damp + solve the assembled system and apply the sim3 update."""
    K = S_all.shape[0]
    D = 7
    Hk = H.reshape(K, D, K, D)
    diag = jnp.maximum(jnp.einsum("kaka->ka", Hk), 1e-8)
    fixed_or_invalid = fixed_mask | (~kf_valid)
    prior = jnp.where(fixed_or_invalid[:, None], 1e12, lm_lambda * diag + 1e-6)
    Hd = H + jnp.diag(prior.reshape(-1))
    cfac = jax.scipy.linalg.cho_factor(Hd, lower=True)
    delta = jax.scipy.linalg.cho_solve(cfac, b).reshape(K, D)
    delta = delta * (~fixed_or_invalid)[:, None]
    if fix_scale:
        delta = delta.at[:, 6].set(0.0)
    return jnp.einsum("kij,kjl->kil", lie.sim3_exp(delta), S_all)


@functools.partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_pose_graph(
    kf_Ssw,  # [K,4,4] current sim3 world->cam (sR | t), se3 embed ok
    kf_valid,
    fixed_mask,  # [K] bool: keyframes held fixed (the loop KF)
    edges: PoseGraphEdges,
    iters: int = 20,
    fix_scale: bool = False,
    lm_lambda: float = 1e-6,
):
    """GN on sim3 vertices; returns corrected [K,4,4] sim3 poses."""
    K = kf_Ssw.shape[0]

    def gn_step(_, S_all):
        H, b = edge_system(S_all, edges, K, fix_scale)
        return solve_and_update(
            S_all, H, b, kf_valid, fixed_mask, fix_scale, lm_lambda
        )

    return jax.lax.fori_loop(0, iters, gn_step, kf_Ssw)
