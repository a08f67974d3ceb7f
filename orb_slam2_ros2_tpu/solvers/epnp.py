"""Batched EPnP + RANSAC for relocalization.

The reference runs EPnP inside a sequential adaptive RANSAC template
(reference: src/PnPSolver.cc — control points :139-176, barycentric :185-212,
M matrix :221-241, null vectors :249-272, ICP :89-131; Ransac.hpp:63-103).
TPU design: ALL hypotheses are generated and scored in parallel — sample H
minimal sets, vmap the EPnP closed form (12×12 eigendecomposition batch),
score every hypothesis against every correspondence on one [H, N] residual
grid, pick the argmax (SURVEY.md §2 #12-13: batched RANSAC replaces the
sequential loop).

Simplification vs the reference: the β-case search + Gauss-Newton refinement
(PnPSolver.cc:280-395) is replaced by the β₁ single-null-vector solution with
sign/scale fixing, because hypotheses only need to be good enough to collect
an inlier consensus — the final pose is polished by pose-only GN anyway
(same role as the reference's reprojection refinement after RANSAC).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.align import horn_align
from ..geometry.camera import CameraParams


def epnp_solve(cam: CameraParams, pw: jnp.ndarray, uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form EPnP for one minimal set: pw [S, 3], uv [S, 2] → (Tcw, ok)."""
    S = pw.shape[0]
    # control points: centroid + PCA axes (PnPSolver.cc:139-176)
    c0 = jnp.mean(pw, axis=0)
    centered = pw - c0
    cov = centered.T @ centered / S
    eigval, eigvec = jnp.linalg.eigh(cov)
    # scale axes by sqrt eigenvalue (largest last); guard degeneracy
    axes = eigvec * jnp.sqrt(jnp.maximum(eigval, 1e-9))[None, :]
    ctrl_w = jnp.concatenate([c0[None], c0[None] + axes.T], axis=0)  # [4, 3]

    # barycentric coordinates (PnPSolver.cc:185-212): pw = Σ α_i ctrl_i
    Cmat = jnp.concatenate([ctrl_w.T, jnp.ones((1, 4))], axis=0)  # [4, 4]
    pwh = jnp.concatenate([pw.T, jnp.ones((1, S))], axis=0)        # [4, S]
    alpha = jnp.linalg.solve(Cmat, pwh).T                          # [S, 4]

    # M matrix (PnPSolver.cc:221-241)
    u = uv[:, 0], uv[:, 1]
    fu, fv, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    a = alpha  # [S, 4]
    row_u = jnp.concatenate(
        [a * fu, jnp.zeros_like(a), a * (cx - uv[:, 0:1])], axis=1
    )  # [S, 12] ordered (x of 4 ctrls, y of 4, z of 4)
    row_v = jnp.concatenate(
        [jnp.zeros_like(a), a * fv, a * (cy - uv[:, 1:2])], axis=1
    )
    M = jnp.concatenate([row_u, row_v], axis=0)  # [2S, 12]
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)
    v = vecs[:, 0]  # smallest eigenvalue → null direction
    # reorder to 4 control points in camera frame: layout is (x1..x4, y1..y4, z1..z4)
    ctrl_c = jnp.stack([v[0:4], v[4:8], v[8:12]], axis=1)  # [4, 3]

    # β₁ scale from control-point inter-distances + cheirality sign
    dw = ctrl_w[1:] - ctrl_w[0]
    dc = ctrl_c[1:] - ctrl_c[0]
    scale = jnp.sum(jnp.linalg.norm(dw, axis=1)) / jnp.maximum(
        jnp.sum(jnp.linalg.norm(dc, axis=1)), 1e-12
    )
    ctrl_c = ctrl_c * scale
    # points must be in front of the camera: flip if mean z < 0
    pc = alpha @ ctrl_c
    sign = jnp.where(jnp.mean(pc[:, 2]) < 0, -1.0, 1.0)
    ctrl_c = ctrl_c * sign

    # rigid alignment world→camera from the 4 control-point pairs
    R, t, _ = horn_align(ctrl_w[None], ctrl_c[None], jnp.ones((1, 4)))
    Tcw = se3.from_Rt(R[0], t[0])
    ok = jnp.all(jnp.isfinite(Tcw)) & (eigval[0] > 1e-12)
    return jnp.where(ok, Tcw, jnp.eye(4)), ok


def ransac_pnp(
    cam: CameraParams,
    pw: jnp.ndarray,        # [N, 3]
    uv: jnp.ndarray,        # [N, 2]
    inv_sigma2: jnp.ndarray,  # [N]
    valid: jnp.ndarray,     # bool[N]
    key: jnp.ndarray,
    *,
    n_hyp: int = 64,
    min_set: int = 6,
    chi2_th: float = 5.991,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Parallel-hypothesis EPnP RANSAC.  Returns (Tcw, inliers [N], n_inliers).

    Replaces PnPSolver::create + Ransac<T>::iterate (sequential, adaptive)
    with a fixed budget of vmapped hypotheses + one dense scoring pass.
    """
    N = pw.shape[0]
    # sample minimal sets weighted toward valid entries
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hyp)

    def sample(k):
        return jax.random.choice(k, N, shape=(min_set,), replace=False, p=jax.nn.softmax(logits))

    sets = jax.vmap(sample)(keys)  # [H, S]

    Tcws, oks = jax.vmap(lambda s: epnp_solve(cam, pw[s], uv[s]))(sets)

    # score all hypotheses × all correspondences
    pc = jnp.einsum("hij,nj->hni", se3.R_of(Tcws), pw) + se3.t_of(Tcws)[:, None, :]
    z = jnp.where(pc[..., 2] > 1e-6, pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    err2 = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) * inv_sigma2[None, :]
    inl = (err2 < chi2_th) & (pc[..., 2] > 0) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=1) * oks.astype(jnp.int32)
    best = jnp.argmax(scores)
    return Tcws[best], inl[best], scores[best]
