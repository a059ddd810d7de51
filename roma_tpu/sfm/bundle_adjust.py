"""Bundle adjustment with Schur-complement reduction — jittable, shardable.

Net-new subsystem (BASELINE.json north star; no reference counterpart).
Levenberg-Marquardt over camera poses (axis-angle + translation, world2cam)
and 3D points, with the camera system solved by MATRIX-FREE Schur-complement
CG:

  H = [U  W; W^T V],   S = U - W V^-1 W^T   (reduced camera system)

S is never materialized. Its matvec decomposes into per-observation segment
ops: u_k = W_k^T x[cam_k];  s_p = V_p^-1 sum_{k in p} u_k;
y[cam_k] -= W_k s_p — all `segment_sum`s over the observation array, which is
exactly the shape GSPMD can shard: put the observation axis on the mesh
`data` axis and the same jitted step runs distributed, with XLA inserting the
cross-device reductions (the psum/all-gather layout of SURVEY §5.8).

Jacobians are exact (vmapped jacfwd of the 2D reprojection residual).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# se3 / projection
# ---------------------------------------------------------------------------

def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3, 3).

    Uses the unnormalized form R = I + a [v]x + b [v]x^2 with
    a = sin(t)/t, b = (1-cos t)/t^2 and Taylor branches selected by the
    double-where trick — differentiable at v = 0 (jacfwd through a
    normalized-axis formula NaNs exactly there, and camera 0 sits at
    rvec = 0 by gauge)."""
    t2 = jnp.sum(rvec * rvec)
    small = t2 < 1e-8
    t2s = jnp.where(small, 1.0, t2)  # keeps the exact branch NaN-free
    t = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    K = jnp.array([
        [0.0, -rvec[2], rvec[1]],
        [rvec[2], 0.0, -rvec[0]],
        [-rvec[1], rvec[0], 0.0],
    ])
    # dtype-explicit eye: under an x64 scope (bundle_adjust_device) a default
    # f64 eye would silently promote the whole heavy f32 path to emulated f64
    return jnp.eye(3, dtype=K.dtype) + a * K + b * (K @ K)


def project(cam: jax.Array, K: jax.Array, X: jax.Array) -> jax.Array:
    """cam (6,) = [rvec, t] world2cam; K (3,3); X (3,) -> pixel (2,)."""
    R = rodrigues(cam[:3])
    Xc = R @ X + cam[3:]
    x = K @ Xc
    return x[:2] / jnp.maximum(x[2], 1e-8)


def _residual(cam, X, uv_n):
    """Reprojection residual in NORMALIZED camera coordinates.

    Pixel-unit residuals give the Gauss-Newton system a condition number of
    ~focal^2 * geometry (measured ~3e9 at f=400), which breaks fp32 CG; in
    normalized units the Jacobian entries are O(1) and fp32 is accurate."""
    R = rodrigues(cam[:3])
    Xc = R @ X + cam[3:]
    return Xc[:2] / jnp.maximum(Xc[2], 1e-8) - uv_n


_res_jac = jax.vmap(jax.jacfwd(_residual, argnums=(0, 1)))
_res_vec = jax.vmap(_residual)


class BAProblem(NamedTuple):
    """Static-shape BA problem. Arrays over the observation axis shard."""

    cameras: jax.Array      # (n_cams, 6) [rvec, tvec] world2cam
    points: jax.Array       # (n_pts, 3)
    intrinsics: jax.Array   # (n_cams, 3, 3)
    cam_idx: jax.Array      # (n_obs,) int32
    pt_idx: jax.Array       # (n_obs,) int32
    uv: jax.Array           # (n_obs, 2) pixel observations
    mask: jax.Array         # (n_obs,) 1.0 valid / 0.0 padding


def _robust_weight(r2: jax.Array, delta: float) -> jax.Array:
    """Huber IRLS weight on squared residual norms."""
    r = jnp.sqrt(r2 + 1e-12)
    return jnp.where(r <= delta, 1.0, delta / r)


def _normalized_obs(p: BAProblem):
    """(uv_n, focal) — observations in normalized camera coords; `focal` maps
    normalized residual magnitudes back to pixels (for Huber thresholds)."""
    Ks = p.intrinsics[p.cam_idx]
    fx, fy = Ks[:, 0, 0], Ks[:, 1, 1]
    cx, cy = Ks[:, 0, 2], Ks[:, 1, 2]
    uv_n = jnp.stack([(p.uv[:, 0] - cx) / fx, (p.uv[:, 1] - cy) / fy], -1)
    return uv_n, 0.5 * (fx + fy)


def _build_blocks(p: BAProblem, huber_delta: float):
    cams = p.cameras[p.cam_idx]
    Xs = p.points[p.pt_idx]
    uv_n, focal = _normalized_obs(p)
    r = _res_vec(cams, Xs, uv_n)                     # (n_obs, 2) normalized
    Jc, Jp = _res_jac(cams, Xs, uv_n)                # (n_obs,2,6), (n_obs,2,3)
    # Huber threshold given in pixels; residuals live in normalized units.
    # Masked observations can carry inf residuals (points at the camera
    # plane, gated out by filter_observations) — mask with `where`, never
    # `* mask` (0 * inf = NaN).
    live = p.mask > 0
    # near-camera-plane points produce O(1/Xc2^2) ~ 1e16 Jacobian entries:
    # finite, but their 1e32 outer products make the fp64 Schur blocks
    # numerically indefinite. Legit normalized-unit Jacobians are O(1/depth);
    # gate absurd rows out of the linearization entirely.
    jmax = jnp.maximum(
        jnp.max(jnp.abs(Jc), axis=(1, 2)), jnp.max(jnp.abs(Jp), axis=(1, 2))
    )
    live = live & jnp.isfinite(jmax) & (jmax < 1e6)
    r = jnp.where(live[:, None], r, 0.0)
    # dead rows can carry inf/NaN residuals AND Jacobians (points at the
    # camera plane, gated out by filter_observations) — mask with `where`,
    # never `* 0` (0 * inf = NaN poisons the segment sums)
    Jc = jnp.where(live[:, None, None], Jc, 0.0)
    Jp = jnp.where(live[:, None, None], Jp, 0.0)
    # clamp: near-camera-plane points overflow fp32 squared-pixel residuals
    r2_px = jnp.minimum(jnp.sum(r * r, -1) * focal * focal, 1e12)
    w = jnp.where(live, _robust_weight(r2_px, huber_delta), 0.0)
    sw = jnp.sqrt(w)[:, None]
    return r * sw, Jc * sw[..., None], Jp * sw[..., None]


def _ba_cost(p: BAProblem, huber_delta: float) -> jax.Array:
    """Robust cost in squared PIXELS (reported metric)."""
    cams = p.cameras[p.cam_idx]
    Xs = p.points[p.pt_idx]
    uv_n, focal = _normalized_obs(p)
    r = _res_vec(cams, Xs, uv_n)
    live = p.mask > 0
    r = jnp.where(live[:, None], r, 0.0)  # NaN-safe masking (see _build_blocks)
    r2_px = jnp.minimum(jnp.sum(r * r, -1) * focal * focal, 1e12)
    w = jnp.where(live, _robust_weight(r2_px, huber_delta), 0.0)
    return jnp.sum(w * r2_px)


def _diag_clamp(M: jax.Array, floor: float = 1e-8) -> jax.Array:
    """diag(M) as damping matrices, floored for never-observed blocks."""
    d = jnp.maximum(jnp.diagonal(M, axis1=-2, axis2=-1), floor)
    return jax.vmap(jnp.diag)(d)


@partial(jax.jit, static_argnames=("n_cg", "huber_delta"))
def ba_step(p: BAProblem, lam: jax.Array, n_cg: int = 50, huber_delta: float = 1e9):
    """One damped Gauss-Newton (LM) step via matrix-free Schur CG.

    Returns (delta_cams (n_cams, 6), delta_points (n_pts, 3), cost)."""
    n_cams = p.cameras.shape[0]
    n_pts = p.points.shape[0]
    r, Jc, Jp = _build_blocks(p, huber_delta)

    # gradient blocks g = J^T r
    g_c = jax.ops.segment_sum(
        jnp.einsum("kij,ki->kj", Jc, r), p.cam_idx, n_cams
    )  # (n_cams, 6)
    g_p = jax.ops.segment_sum(
        jnp.einsum("kij,ki->kj", Jp, r), p.pt_idx, n_pts
    )  # (n_pts, 3)

    # Hessian diagonals
    U = jax.ops.segment_sum(
        jnp.einsum("kia,kib->kab", Jc, Jc), p.cam_idx, n_cams
    )  # (n_cams, 6, 6)
    V = jax.ops.segment_sum(
        jnp.einsum("kia,kib->kab", Jp, Jp), p.pt_idx, n_pts
    )  # (n_pts, 3, 3)
    # Marquardt damping: scale by each block's own diagonal so lambda is
    # unit-free (plain lam*I swamps the normalized-unit Hessian)
    U = U + lam * _diag_clamp(U) + 1e-10 * jnp.eye(6, dtype=U.dtype)
    V = V + lam * _diag_clamp(V) + 1e-10 * jnp.eye(3, dtype=V.dtype)
    V_inv = jnp.linalg.inv(V)

    # per-observation coupling block W_k = Jc_k^T Jp_k  (6, 3)
    W = jnp.einsum("kia,kib->kab", Jc, Jp)

    def schur_matvec(x):  # x (n_cams, 6)
        y = jnp.einsum("cab,cb->ca", U, x)
        u = jnp.einsum("kab,ka->kb", W, x[p.cam_idx])          # (n_obs, 3)
        su = jax.ops.segment_sum(u, p.pt_idx, n_pts)           # (n_pts, 3)
        s = jnp.einsum("pab,pb->pa", V_inv, su)                # (n_pts, 3)
        back = jnp.einsum("kab,kb->ka", W, s[p.pt_idx])        # (n_obs, 6)
        return y - jax.ops.segment_sum(back, p.cam_idx, n_cams)

    # rhs b = -(g_c - W V^-1 g_p)
    s_g = jnp.einsum("pab,pb->pa", V_inv, g_p)
    coup = jax.ops.segment_sum(
        jnp.einsum("kab,kb->ka", W, s_g[p.pt_idx]), p.cam_idx, n_cams
    )
    b = -(g_c - coup)

    if n_cg == 0:
        # dense reduced camera system: S = U_embed - D D^T with
        # D[p] = scatter_c(W_k L_p^-T) — one scatter + one MXU matmul.
        # Exact (no iteration), preferred while 6*n_cams stays dense-friendly;
        # fp32 CG on S stalls well before convergence at BA conditioning.
        L = jnp.linalg.cholesky(V)
        # C_k = W_k L_p^-T: solve L_p C^T = W_k^T
        Ct = jax.lax.linalg.triangular_solve(
            L[p.pt_idx], jnp.swapaxes(W, -1, -2), left_side=True, lower=True
        )  # (n_obs, 3, 6)
        C = jnp.swapaxes(Ct, -1, -2)  # (n_obs, 6, 3)
        D = jnp.zeros((n_pts, n_cams, 6, 3), jnp.float32)
        D = D.at[p.pt_idx, p.cam_idx].add(C)
        Dm = D.reshape(n_pts, n_cams * 6, 3)
        M = jnp.einsum(
            "pax,pbx->ab", Dm, Dm, precision=jax.lax.Precision.HIGHEST
        )
        S = -M
        U_rows = jax.vmap(lambda u: u)(U)  # (n_cams, 6, 6)
        S = S.reshape(n_cams, 6, n_cams, 6)
        S = S.at[jnp.arange(n_cams), :, jnp.arange(n_cams), :].add(U_rows)
        S = S.reshape(n_cams * 6, n_cams * 6)
        delta_c = jnp.linalg.solve(S, b.reshape(-1)).reshape(n_cams, 6)
    else:
        # Jacobi-preconditioned CG (matrix-free; the distributed path)
        U_diag_inv = jnp.linalg.inv(U)

        def precond(v):
            return jnp.einsum("cab,cb->ca", U_diag_inv, v)

        def cg_body(_, state):
            x, rr, z, pdir = state
            Ap = schur_matvec(pdir)
            alpha = jnp.vdot(rr, z) / jnp.maximum(jnp.vdot(pdir, Ap), 1e-12)
            x = x + alpha * pdir
            r_new = rr - alpha * Ap
            z_new = precond(r_new)
            beta = jnp.vdot(r_new, z_new) / jnp.maximum(jnp.vdot(rr, z), 1e-12)
            return x, r_new, z_new, z_new + beta * pdir

        z0 = precond(b)
        state = (jnp.zeros_like(b), b, z0, z0)
        x, *_ = jax.lax.fori_loop(0, n_cg, cg_body, state)
        delta_c = x

    # back-substitute points: delta_p = -V^-1 (g_p + W^T delta_c)
    wtd = jax.ops.segment_sum(
        jnp.einsum("kab,ka->kb", W, delta_c[p.cam_idx]), p.pt_idx, n_pts
    )
    delta_p = -jnp.einsum("pab,pb->pa", V_inv, g_p + wtd)

    return delta_c, delta_p, _ba_cost(p, huber_delta)


@partial(jax.jit, static_argnames=("huber_delta",))
def _ba_blocks(p: BAProblem, huber_delta: float = 1e9):
    """Jitted block extraction for the host-precision Schur solve."""
    n_cams = p.cameras.shape[0]
    n_pts = p.points.shape[0]
    r, Jc, Jp = _build_blocks(p, huber_delta)
    g_c = jax.ops.segment_sum(jnp.einsum("kij,ki->kj", Jc, r), p.cam_idx, n_cams)
    g_p = jax.ops.segment_sum(jnp.einsum("kij,ki->kj", Jp, r), p.pt_idx, n_pts)
    U = jax.ops.segment_sum(jnp.einsum("kia,kib->kab", Jc, Jc), p.cam_idx, n_cams)
    V = jax.ops.segment_sum(jnp.einsum("kia,kib->kab", Jp, Jp), p.pt_idx, n_pts)
    W = jnp.einsum("kia,kib->kab", Jc, Jp)
    return U, V, W, g_c, g_p


def _host_schur_solve(U, V, W, g_c, g_p, cam_idx, pt_idx, lam, fix_first_cam=True):
    """Exact damped GN step in float64 on host. The reduced camera system has
    cond ~1e9 (gauge + mixed units), beyond fp32 — the LM driver solves it at
    full precision; sizes are (6 n_cams)^2."""
    U = U.astype(np.float64)
    V = V.astype(np.float64)
    W = W.astype(np.float64)
    g_c = g_c.astype(np.float64)
    g_p = g_p.astype(np.float64)
    nc, npt = len(U), len(V)
    U = U + lam * np.stack([np.diag(np.maximum(np.diag(u), 1e-8)) for u in U])
    V = V + lam * np.stack([np.diag(np.maximum(np.diag(v), 1e-8)) for v in V])
    # symmetrize + relative floor: V is PSD by construction only up to
    # rounding of its own magnitude (near-plane points give ~1e10 entries);
    # an absolute 1e-8 floor also keeps zero-observation points SPD (their
    # g_p is 0, so delta_p stays 0)
    V = 0.5 * (V + np.transpose(V, (0, 2, 1)))
    # PSD projection: V is PSD by construction only up to rounding of its own
    # magnitude (near-plane points give ~1e10 entries); clamp eigenvalues so
    # the Cholesky below is unconditionally valid. Zero-observation points
    # get eps*I (their g_p is 0, so delta_p stays 0).
    evals, evecs = np.linalg.eigh(V)
    floor = 1e-8 + 1e-9 * np.maximum(evals[:, -1], 0.0)
    evals = np.maximum(evals, floor[:, None])
    V = np.einsum("pab,pb,pcb->pac", evecs, evals, evecs)
    if fix_first_cam:
        # pin the gauge INSIDE the system — zeroing the delta after solving a
        # coupled system injects inconsistency into every other update
        U[0] += 1e10 * np.eye(6)
    V_inv = np.linalg.inv(V)
    # dense S via per-point scatter of C = W L^-T  (C L^T = W  <=>  L C^T = W^T)
    L = np.linalg.cholesky(V)
    C = np.linalg.solve(L[pt_idx], np.transpose(W, (0, 2, 1))).transpose(0, 2, 1)
    D = np.zeros((npt, nc, 6, 3))
    np.add.at(D, (pt_idx, cam_idx), C)
    Dm = D.reshape(npt, nc * 6, 3)
    S = -np.einsum("pax,pbx->ab", Dm, Dm)
    for c in range(nc):
        S[6 * c : 6 * c + 6, 6 * c : 6 * c + 6] += U[c]
    s_g = np.einsum("pab,pb->pa", V_inv, g_p)
    coup = np.zeros((nc, 6))
    np.add.at(coup, cam_idx, np.einsum("kab,kb->ka", W, s_g[pt_idx]))
    b = -(g_c - coup)
    delta_c = np.linalg.solve(S, b.reshape(-1)).reshape(nc, 6)
    wtd = np.zeros((npt, 3))
    np.add.at(wtd, pt_idx, np.einsum("kab,ka->kb", W, delta_c[cam_idx]))
    delta_p = -np.einsum("pab,pb->pa", V_inv, g_p + wtd)
    return delta_c, delta_p


def reprojection_errors_px(p: BAProblem) -> tuple[jax.Array, jax.Array]:
    """(per-observation reprojection error in px, cheirality ok flags)."""
    cams = p.cameras[p.cam_idx]
    Xs = p.points[p.pt_idx]
    uv_n, focal = _normalized_obs(p)
    Rs = jax.vmap(rodrigues)(cams[:, :3])
    Xc = jnp.einsum("kij,kj->ki", Rs, Xs) + cams[:, 3:]
    r = Xc[:, :2] / jnp.maximum(Xc[:, 2:], 1e-8) - uv_n
    err_px = jnp.linalg.norm(r, axis=-1) * focal
    return err_px, Xc[:, 2] > 1e-3


def filter_observations(
    p: BAProblem, max_err_px: float, keep_quantile: float | None = None
) -> BAProblem:
    """Zero the mask of observations whose CURRENT reprojection error exceeds
    the gate or whose point sits behind its camera (static shapes: the gate
    is the mask, nothing is resized). Outlier tracks otherwise dominate the
    robust cost linearly (w*r^2 = delta*r) and stall LM.

    `keep_quantile` loosens the gate to at least that quantile of the
    currently-valid errors — at a rough initialization most honest
    observations exceed a tight pixel gate; the quantile keeps the inlier
    mass while still cutting the worst tail."""
    err_px, in_front = reprojection_errors_px(p)
    gate = max_err_px
    if keep_quantile is not None:
        # quantile over VALID entries only (invalid ones sort to +inf and the
        # rank is taken within the valid count) — substituting a sentinel
        # into jnp.quantile would pull the gate into the sentinel mass when
        # many observations are masked/behind-camera (ADVICE r2)
        valid = (p.mask > 0) & in_front & jnp.isfinite(err_px)
        n_valid = jnp.sum(valid)
        sorted_err = jnp.sort(jnp.where(valid, err_px, jnp.inf))
        # linear interpolation between the bracketing order statistics —
        # jnp.quantile parity with the host path (ADVICE r3: a floor()'d
        # rank alone biases the gate low by up to one observation step)
        pos = keep_quantile * jnp.maximum(n_valid - 1, 0)
        rank = jnp.clip(pos.astype(jnp.int32), 0, err_px.shape[0] - 1)
        rank_hi = jnp.clip(
            jnp.minimum(rank + 1, n_valid - 1), 0, err_px.shape[0] - 1
        )
        frac = pos - rank.astype(pos.dtype)
        q_interp = sorted_err[rank] * (1 - frac) + sorted_err[rank_hi] * frac
        q = jnp.where(n_valid > 0, q_interp, max_err_px)
        gate = jnp.maximum(max_err_px, q)
    keep = (err_px < gate) & in_front
    return p._replace(mask=p.mask * keep.astype(p.mask.dtype))


def bundle_adjust(
    problem: BAProblem,
    iters: int = 20,
    lam0: float = 1e-4,
    huber_delta: float = 1e9,
    fix_first_cam: bool = True,
    max_err_px: float | None = None,
    refilter_every: int = 10,
    verbose: bool = False,
):
    """LM driver: jitted residual/Jacobian blocks on device, exact fp64 Schur
    solve on host. Returns (optimized problem, final robust cost in px^2)."""
    p = problem
    if max_err_px is not None:
        # generous initial gate (keep ~90% of currently-valid observations),
        # tightened to max_err_px at the periodic refilters below
        p = filter_observations(p, max_err_px, keep_quantile=0.9)
    lam = lam0
    cam_idx = np.asarray(p.cam_idx)
    pt_idx = np.asarray(p.pt_idx)
    cost = float(_ba_cost(p, huber_delta))
    for it in range(iters):
        if max_err_px is not None and it > 0 and it % refilter_every == 0:
            # re-admit observations that became consistent, drop new outliers
            p = filter_observations(
                p._replace(mask=problem.mask), max_err_px
            )
            cost = float(_ba_cost(p, huber_delta))
        U, V, W, g_c, g_p = [
            np.asarray(a) for a in _ba_blocks(p, huber_delta=huber_delta)
        ]
        dc, dp = _host_schur_solve(
            U, V, W, g_c, g_p, cam_idx, pt_idx, lam, fix_first_cam
        )
        if fix_first_cam:
            dc[0] = 0.0  # exactly zero the (already ~zero) pinned block
        cand = p._replace(
            cameras=p.cameras + jnp.asarray(dc, jnp.float32),
            points=p.points + jnp.asarray(dp, jnp.float32),
        )
        new_cost = float(_ba_cost(cand, huber_delta))
        if new_cost < cost:
            p, cost = cand, new_cost
            lam = max(lam * 0.3, 1e-10)
        else:
            lam = min(lam * 5.0, 1e6)
        if verbose:
            print(f"BA it {it}: cost {cost:.6g} lam {lam:.2e}")
    return p, cost


def _chol3(A: jax.Array) -> jax.Array:
    """Closed-form lower Cholesky of batched SPD 3x3 (pure elementwise ops —
    TPU's XLA has no f64 Cholesky primitive, but emulates f64 arithmetic)."""
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    tiny = jnp.asarray(1e-30, A.dtype)
    l11 = jnp.sqrt(jnp.maximum(a11, tiny))
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, tiny))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, tiny))
    z = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, z, z], -1),
            jnp.stack([l21, l22, z], -1),
            jnp.stack([l31, l32, l33], -1),
        ],
        -2,
    )


def _inv3_spd(A: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of batched symmetric 3x3 — same
    no-f64-linalg-primitive constraint as `_chol3`."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    ca = d * f - e * e
    cb = c * e - b * f
    cc = b * e - c * d
    det = a * ca + b * cb + c * cc
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    cd = a * f - c * c
    ce = b * c - a * e
    cf = a * d - b * b
    inv = jnp.stack(
        [
            jnp.stack([ca, cb, cc], -1),
            jnp.stack([cb, cd, ce], -1),
            jnp.stack([cc, ce, cf], -1),
        ],
        -2,
    )
    return inv / det[..., None, None]


def _dense_schur_solve_f64(U, V, W, g_c, g_p, cam_idx, pt_idx, fix_first_cam):
    """Damped-GN camera/point deltas via a dense reduced camera system,
    entirely on device (traced under x64): the big per-observation work (U,
    V, W, D assembly) stays fp32 on the MXU — its ~1e-7 relative rounding of
    S costs only a slightly-perturbed DESCENT DIRECTION — while the
    ill-conditioned part (cond(S) ~1e9: gauge pin + mixed units) is handled
    in float64 elementwise math. TPU's XLA implements NO f64 linalg
    primitives (LuDecomposition/Cholesky are F32-only custom calls), so:
    - the per-point 3x3 Cholesky/inverse use closed forms (pure f64
      elementwise ops, which TPU does emulate),
    - the (6 n_cams)^2 system is Jacobi-scaled, factorized ONCE in f32
      Cholesky, and corrected by f64 iterative refinement (residual via an
      elementwise multiply-reduce matvec — no f64 dot). After scaling the
      condition is ~1e4-1e6, so eps_f32 * cond < 1 and refinement converges
      to f64-level accuracy in a few sweeps.

    Replaces `_host_schur_solve` (kept as the CPU test oracle): same math,
    no host transfer of the 100k-observation block arrays, jittable into the
    LM loop, and shardable over the observation axis (segment-sums become
    XLA all-reduces under GSPMD)."""
    n_cams, n_pts = U.shape[0], V.shape[0]
    f64 = jnp.float64
    if fix_first_cam:
        # pin the gauge INSIDE the system — zeroing the delta after solving a
        # coupled system injects inconsistency into every other update
        U = U.at[0].add(1e10 * jnp.eye(6, dtype=U.dtype))
    # V: PSD up to fp32 segment-sum rounding (~1e-7 relative); a relative
    # diagonal floor dominates that rounding so the f64 factorization is
    # unconditionally valid. Zero-observation points get eps*I (their g_p is
    # 0, so delta_p stays 0).
    Vd = V.astype(f64)
    Vd = 0.5 * (Vd + jnp.swapaxes(Vd, -1, -2))
    vmax = jnp.maximum(jnp.max(jnp.diagonal(Vd, axis1=-2, axis2=-1), -1), 0.0)
    Vd = Vd + (1e-8 + 1e-6 * vmax)[:, None, None] * jnp.eye(3, dtype=f64)
    L = _chol3(Vd)
    V_inv = _inv3_spd(Vd)
    mv3 = lambda A, x: jnp.sum(A * x[..., None, :], axis=-1)  # no f64 dot
    # dense S via per-point scatter of C = W L^-T (fp32 MXU for the O(n_obs)
    # and O(n_pts * n_cams) work)
    Ct = jax.lax.linalg.triangular_solve(
        L[pt_idx].astype(jnp.float32), jnp.swapaxes(W, -1, -2),
        left_side=True, lower=True,
    )  # (n_obs, 3, 6)
    D = jnp.zeros((n_pts, n_cams, 6, 3), jnp.float32)
    D = D.at[pt_idx, cam_idx].add(jnp.swapaxes(Ct, -1, -2))
    Dm = D.reshape(n_pts, n_cams * 6, 3)
    M = jnp.einsum("pax,pbx->ab", Dm, Dm, precision=jax.lax.Precision.HIGHEST)
    S = -M.astype(f64)
    S = S.reshape(n_cams, 6, n_cams, 6)
    S = S.at[jnp.arange(n_cams), :, jnp.arange(n_cams), :].add(U.astype(f64))
    S = S.reshape(n_cams * 6, n_cams * 6)
    # rhs b = -(g_c - W V^-1 g_p)
    s_g = mv3(V_inv, g_p.astype(f64))
    coup = jax.ops.segment_sum(
        mv3(W.astype(f64), s_g[pt_idx]), cam_idx, n_cams
    )
    b = -(g_c.astype(f64) - coup).reshape(-1)
    # Jacobi scaling, f32 factorization, f64 iterative refinement
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    Ssc = S / (d[:, None] * d[None, :]) + 1e-10 * jnp.eye(
        n_cams * 6, dtype=f64
    )
    b_sc = b / d
    Lc = jnp.linalg.cholesky(Ssc.astype(jnp.float32))

    def solve32(r):
        y = jax.lax.linalg.triangular_solve(
            Lc, r.astype(jnp.float32)[:, None], left_side=True, lower=True
        )
        y = jax.lax.linalg.triangular_solve(
            Lc, y, left_side=True, lower=True, transpose_a=True
        )
        return y[:, 0].astype(f64)

    x = solve32(b_sc)
    for _ in range(4):
        resid = b_sc - jnp.sum(Ssc * x[None, :], axis=-1)
        x = x + solve32(resid)
    delta_c = (x / d).reshape(n_cams, 6)
    # back-substitute points: delta_p = -V^-1 (g_p + W^T delta_c)
    wtd = jax.ops.segment_sum(
        mv3(jnp.swapaxes(W, -1, -2).astype(f64), delta_c.astype(f64)[cam_idx]),
        pt_idx, n_pts,
    )
    delta_p = -mv3(V_inv, g_p.astype(f64) + wtd)
    return delta_c.astype(jnp.float32), delta_p.astype(jnp.float32)


def _cg_schur_solve(U, V, W, g_c, g_p, cam_idx, pt_idx, fix_first_cam,
                    n_inner=60, n_outer=3, pt_shard=None, obs_shard=None,
                    cam_shard=None, x0=None):
    """Matrix-free Schur-complement camera solve at bounded memory: O(n_obs)
    work and storage — no (n_pts, n_cams) scatter, no (6 n_cams)^2 dense
    system — so it scales past the dense driver's few-hundred-camera ceiling
    (ADVICE r3; VERDICT r3 #3).

    The dense path's accuracy recipe transfers: an f32 inner CG
    preconditioned with the EXACT block diagonal of S (block-Jacobi of the
    reduced system, not of U — it includes the point-elimination term, which
    is what makes fp32 CG converge at BA conditioning), wrapped in an f64
    iterative-refinement outer loop whose residuals use f64 segment-sum
    matvecs. `pt_shard`/`obs_shard`/`cam_shard`: optional NamedShardings
    constraining the point-block, observation, and CAMERA-axis intermediates
    on a mesh — the keyframe / map-block partitioning (VERDICT r4 #4):
    per-point factors, per-observation terms, AND the per-camera state
    (U, block-Jacobi factors, CG iterates) all live distributed; XLA inserts
    the small all-gather of the 6*n_cams iterate feeding the per-observation
    gather and a reduce-scatter for the segment-sums back onto the camera
    shard — the only inter-block coupling that actually crosses the mesh.

    `x0`: optional warm start for the camera solve (the previous LM
    iteration's delta — the f64 refinement loop starts from it instead of
    zero, so each inner CG only corrects what the trust-region change
    actually moved)."""
    f64 = jnp.float64
    n_cams, n_pts = U.shape[0], V.shape[0]
    if fix_first_cam:
        U = U.at[0].add(1e10 * jnp.eye(6, dtype=U.dtype))

    def shard(x, s):
        return jax.lax.with_sharding_constraint(x, s) if s is not None else x

    U = shard(U, cam_shard)

    # V: symmetrize + relative diagonal floor (mirrors the dense path), then
    # closed-form SPD inverse per 3x3 block
    Vs = 0.5 * (V + jnp.swapaxes(V, -1, -2))
    vmax = jnp.maximum(jnp.max(jnp.diagonal(Vs, axis1=-2, axis2=-1), -1), 0.0)
    Vs = Vs + (1e-8 + 1e-6 * vmax)[:, None, None] * jnp.eye(3, dtype=Vs.dtype)
    V_inv = shard(_inv3_spd(Vs), pt_shard)

    mv66 = lambda A, x: jnp.einsum("cab,cb->ca", A, x)

    def schur_matvec(x, U_, W_, Vi_):
        y = mv66(U_, x)
        u = jnp.einsum("kab,ka->kb", W_, x[cam_idx])
        su = jax.ops.segment_sum(u, pt_idx, n_pts)
        s = jnp.einsum("pab,pb->pa", Vi_, su)
        back = jnp.einsum("kab,kb->ka", W_, s[pt_idx])
        return shard(y - jax.ops.segment_sum(back, cam_idx, n_cams),
                     cam_shard)

    # exact block diagonal of S (one obs per (cam, pt) pair in SfM tracks):
    # S_cc = U_c - sum_{k: cam_k = c} W_k V_{p(k)}^-1 W_k^T
    WVi = shard(jnp.einsum("kab,kbc->kac", W, V_inv[pt_idx]), obs_shard)
    Sd = U - jax.ops.segment_sum(
        jnp.einsum("kac,kdc->kad", WVi, W), cam_idx, n_cams
    )
    Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))
    dmax = jnp.maximum(jnp.max(jnp.diagonal(Sd, axis1=-2, axis2=-1), -1), 0.0)
    Sd = Sd + (1e-7 + 1e-6 * dmax)[:, None, None] * jnp.eye(6, dtype=Sd.dtype)
    P_inv = shard(jnp.linalg.inv(shard(Sd, cam_shard)), cam_shard)

    def pcg(rhs):
        """Jacobi(S)-preconditioned CG in f32, fixed n_inner iterations."""
        rhs32 = rhs.astype(jnp.float32)

        def body(_, state):
            x, rr, z, pdir = state
            Ap = schur_matvec(
                pdir, U.astype(jnp.float32), W.astype(jnp.float32),
                V_inv.astype(jnp.float32),
            )
            rz = jnp.vdot(rr, z)
            denom = jnp.vdot(pdir, Ap)
            alpha = rz / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * pdir
            r_new = rr - alpha * Ap
            z_new = mv66(P_inv, r_new)
            beta = jnp.vdot(r_new, z_new) / jnp.where(rz == 0, 1.0, rz)
            return x, r_new, z_new, z_new + beta * pdir

        z0 = mv66(P_inv, rhs32)
        x, *_ = jax.lax.fori_loop(
            0, n_inner, body, (jnp.zeros_like(rhs32), rhs32, z0, z0)
        )
        return x

    # rhs b = -(g_c - W V^-1 g_p), f64
    s_g = jnp.einsum("pab,pb->pa", V_inv.astype(f64), g_p.astype(f64))
    coup = jax.ops.segment_sum(
        jnp.einsum("kab,kb->ka", W.astype(f64), s_g[pt_idx]), cam_idx, n_cams
    )
    b = -(g_c.astype(f64) - coup)

    U64, W64, Vi64 = U.astype(f64), W.astype(f64), V_inv.astype(f64)
    if x0 is None:
        x = jnp.zeros_like(b)
    else:
        # guarded warm start: near convergence the previous delta can be a
        # WORSE guess than zero (deltas shrink) — keep it only if it
        # actually reduces the residual (one extra matvec)
        xw = shard(x0.astype(f64), cam_shard)
        r0 = b - schur_matvec(xw, U64, W64, Vi64)
        use = jnp.sum(r0 * r0) < jnp.sum(b * b)
        x = jnp.where(use, xw, jnp.zeros_like(xw))
    for _ in range(n_outer):
        resid = b - schur_matvec(x, U64, W64, Vi64)
        x = x + pcg(resid).astype(f64)
    delta_c = x.astype(jnp.float32).reshape(n_cams, 6)
    # back-substitute points: delta_p = -V^-1 (g_p + W^T delta_c)
    wtd = jax.ops.segment_sum(
        jnp.einsum("kab,ka->kb", W64, x.reshape(n_cams, 6)[cam_idx]),
        pt_idx, n_pts,
    )
    delta_p = shard(
        -jnp.einsum("pab,pb->pa", Vi64, g_p.astype(f64) + wtd), pt_shard
    ).astype(jnp.float32)
    return delta_c, delta_p


def _lm_iteration(p, lam, cost, huber_delta, fix_first_cam, solver="dense",
                  pt_shard=None, obs_shard=None, cam_shard=None,
                  dc_prev=None):
    """One accept/reject LM iteration (jittable). `dc_prev` warm-starts the
    CG camera solve with the previous iteration's delta (returned alongside
    the new state so the LM scan can carry it)."""
    n_cams, n_pts = p.cameras.shape[0], p.points.shape[0]
    r, Jc, Jp = _build_blocks(p, huber_delta)
    g_c = jax.ops.segment_sum(jnp.einsum("kij,ki->kj", Jc, r), p.cam_idx, n_cams)
    g_p = jax.ops.segment_sum(jnp.einsum("kij,ki->kj", Jp, r), p.pt_idx, n_pts)
    U = jax.ops.segment_sum(jnp.einsum("kia,kib->kab", Jc, Jc), p.cam_idx, n_cams)
    V = jax.ops.segment_sum(jnp.einsum("kia,kib->kab", Jp, Jp), p.pt_idx, n_pts)
    W = jnp.einsum("kia,kib->kab", Jc, Jp)
    U = U + lam * _diag_clamp(U)
    V = V + lam * _diag_clamp(V)
    if solver == "cg":
        dc, dp = _cg_schur_solve(
            U, V, W, g_c, g_p, p.cam_idx, p.pt_idx, fix_first_cam,
            pt_shard=pt_shard, obs_shard=obs_shard, cam_shard=cam_shard,
            x0=dc_prev,
        )
    else:
        dc, dp = _dense_schur_solve_f64(
            U, V, W, g_c, g_p, p.cam_idx, p.pt_idx, fix_first_cam
        )
    if fix_first_cam:
        dc = dc.at[0].set(0.0)  # exactly zero the (already ~zero) pinned block
    # NaN guard: a failed factorization must reject, not poison the state
    bad = ~(jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp)))
    dc = jnp.where(bad, 0.0, dc)
    dp = jnp.where(bad, 0.0, dp)
    cand = p._replace(cameras=p.cameras + dc, points=p.points + dp)
    new_cost = _ba_cost(cand, huber_delta)
    accept = (new_cost < cost) & ~bad
    p = jax.tree.map(
        lambda a, b_: jnp.where(accept, b_, a)
        if a.dtype in (jnp.float32, jnp.float64)
        else a,
        p, cand,
    )
    cost = jnp.where(accept, new_cost, cost)
    lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-10),
                    jnp.minimum(lam * 5.0, 1e6))
    return p, lam, cost, dc


def bundle_adjust_device(
    problem: BAProblem,
    iters: int = 30,
    lam0: float = 1e-4,
    huber_delta: float = 1e9,
    fix_first_cam: bool = True,
    max_err_px: float | None = None,
    refilter_every: int = 10,
    mesh=None,
    solver: str = "dense",
    iters_per_launch: int | None = None,
):
    """Fully device-resident LM: the WHOLE optimization (linearize -> dense
    f64-solved Schur step -> accept/reject -> periodic outlier refilter) is
    one jitted `lax.scan` — no host transfers or per-iteration dispatches
    (vs the `bundle_adjust` host driver: ~25 MB of Schur blocks shipped
    through the tunneled runtime plus a numpy scatter/solve per iteration).

    `mesh`: optional jax.sharding.Mesh; shards the observation axis over its
    "data" axis (cameras/points replicated), turning the segment-sums into
    XLA all-reduces — the distributed Schur-complement BA path.

    Scale ceiling (ADVICE r3): the exact dense-Schur step materializes a
    (n_pts, n_cams, 6, 3) f32 scatter plus the (6*n_cams)^2 reduced system —
    O(n_pts * n_cams) memory, ~3.6 GB at 100k pts x 500 cams. Beyond a few
    hundred cameras use `bundle_adjust_cg_device` (matrix-free preconditioned
    CG on the Schur complement: O(n_obs) memory, no per-point scatter).

    `solver`: "dense" (exact f64 Schur — best under ~300 cams) or "cg"
    (matrix-free block-Jacobi(S)-preconditioned CG with f64 iterative
    refinement — O(n_obs) memory, the at-scale path; `bundle_adjust_cg_device`
    is this with solver="cg").

    `iters_per_launch`: split the LM scan into device launches of at most
    this many iterations (full carry — problem, lambda, cost, warm-start
    delta — handed through the host between launches; bit-identical math,
    one shared executable). Use on runtimes that kill long single
    executions (a 60-iter 1k-cam scan is one ~15-min launch).

    Returns (optimized problem, final robust cost in px^2)."""
    import functools as _ft

    p0 = problem
    if max_err_px is not None:
        p0 = filter_observations(p0, max_err_px, keep_quantile=0.9)

    if mesh is not None and solver == "cg":
        from jax.sharding import NamedSharding, PartitionSpec as P

        pt_shard = NamedSharding(mesh, P("data"))
        obs_shard = NamedSharding(mesh, P("data"))
        # keyframe partitioning (VERDICT r4 #4): the per-camera state of the
        # CG solve (U, block-Jacobi factors, iterates) lives sharded too
        cam_shard = NamedSharding(mesh, P("data"))
    else:
        pt_shard = obs_shard = cam_shard = None

    @_ft.partial(
        jax.jit, static_argnames=("iters", "huber_delta", "fix_first_cam",
                                  "refilter_every", "gate_px")
    )
    def run(carry, full_mask, start, iters, huber_delta, fix_first_cam,
            refilter_every, gate_px):
        # `start` is TRACED (the global iteration offset for the refilter
        # cadence) so chunked launches share one compiled executable
        def body(carry, it):
            p, lam, cost, dc_prev = carry
            if gate_px is not None:
                def refilter(p):
                    pf = filter_observations(
                        p._replace(mask=full_mask), gate_px
                    )
                    return pf, _ba_cost(pf, huber_delta)

                do = (it > 0) & (it % refilter_every == 0)
                pf, cf = refilter(p)
                sel = lambda a, b_: jnp.where(do, a, b_)
                p = jax.tree.map(sel, pf, p)
                cost = jnp.where(do, cf, cost)
            p, lam, cost, dc = _lm_iteration(
                p, lam, cost, huber_delta, fix_first_cam, solver=solver,
                pt_shard=pt_shard, obs_shard=obs_shard, cam_shard=cam_shard,
                dc_prev=dc_prev if solver == "cg" else None,
            )
            return (p, lam, cost, dc), cost

        carry, _hist = jax.lax.scan(
            body, carry, start + jnp.arange(iters, dtype=jnp.int32),
        )
        return carry

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        obs = NamedSharding(mesh, P("data"))
        p0 = BAProblem(
            cameras=jax.device_put(p0.cameras, rep),
            points=jax.device_put(p0.points, rep),
            intrinsics=jax.device_put(p0.intrinsics, rep),
            cam_idx=jax.device_put(p0.cam_idx, obs),
            pt_idx=jax.device_put(p0.pt_idx, obs),
            uv=jax.device_put(p0.uv, obs),
            mask=jax.device_put(p0.mask, obs),
        )
        full_mask = jax.device_put(problem.mask, obs)
    else:
        full_mask = problem.mask

    # highest matmul precision: TPU's default bf16 matmul passes would
    # degrade the f32 Cholesky factor below what the f64 iterative
    # refinement can recover from (cond * eps_bf16 > 1)
    with jax.enable_x64(True), jax.default_matmul_precision("highest"):
        cost0 = jax.jit(_ba_cost, static_argnames=("huber_delta",))(
            p0, huber_delta
        )
        carry = (p0, jnp.float32(lam0), cost0, jnp.zeros_like(p0.cameras))
        # bounded single-launch length: one lax.scan over all iters is a
        # single ~15 s/iter device execution at 1k-cam scale — long enough
        # to trip runtime watchdogs on tunneled workers (observed twice at
        # 60 iters). Chunking hands the FULL carry (problem, lambda, cost,
        # warm-start delta) back through the host between launches:
        # bit-identical math, same compile (one jit keyed on chunk size +
        # one for the remainder), and each launch stays a few minutes.
        chunk = iters_per_launch or iters
        start = 0
        while start < iters:
            k = min(chunk, iters - start)
            carry = run(
                carry, full_mask, jnp.int32(start), k, huber_delta,
                fix_first_cam, refilter_every, max_err_px,
            )
            if iters_per_launch is not None:
                # readback barrier: launches dispatch asynchronously, so
                # without this the device still queues the whole run
                # back-to-back (block_until_ready returns early on the
                # tunneled runtime; a scalar fetch is the reliable sync)
                float(carry[2])
            start += k
        p, _, cost, _ = carry
    return p, float(cost)


def bundle_adjust_cg_device(problem: BAProblem, **kwargs):
    """`bundle_adjust_device` with the matrix-free CG solver — the at-scale
    path: O(n_obs) memory, demonstrated at 1k cams / 100k pts / 1M obs on
    one v5e where the dense path's (n_pts, n_cams) scatter would need ~7 GB
    for the scatter alone (SFM.md round-4 table)."""
    kwargs["solver"] = "cg"
    return bundle_adjust_device(problem, **kwargs)


def make_distributed_ba_step(mesh, n_cg: int = 50, huber_delta: float = 1e9):
    """The same `ba_step`, jitted with the observation axis sharded over the
    mesh `data` axis (cameras/points replicated). XLA inserts the segment-sum
    all-reduces — this IS the distributed Schur-complement BA."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    obs = NamedSharding(mesh, P("data"))
    prob_shard = BAProblem(
        cameras=rep, points=rep, intrinsics=rep,
        cam_idx=obs, pt_idx=obs, uv=obs, mask=obs,
    )
    return jax.jit(
        partial(ba_step, n_cg=n_cg, huber_delta=huber_delta),
        in_shardings=(prob_shard, rep),
        out_shardings=(rep, rep, rep),
    )


def triangulate_tracks(
    cameras: np.ndarray,
    intrinsics: np.ndarray,
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    n_pts: int,
) -> np.ndarray:
    """Multiview midpoint triangulation via segment ops (vectorized DLT-free).

    Solves per point: (sum_k I - d_k d_k^T) X = sum_k (I - d_k d_k^T) c_k
    where d_k are the world-frame observation rays."""
    cams = jnp.asarray(cameras)[jnp.asarray(cam_idx)]
    Ks = jnp.asarray(intrinsics)[jnp.asarray(cam_idx)]
    Rs = jax.vmap(rodrigues)(cams[:, :3])
    centers = -jnp.einsum("kij,ki->kj", Rs, cams[:, 3:])
    ray_cam = jnp.einsum(
        "kij,kj->ki",
        jnp.linalg.inv(Ks),
        jnp.concatenate([jnp.asarray(uv), jnp.ones((len(uv), 1))], -1),
    )
    d = jnp.einsum("kji,kj->ki", Rs, ray_cam)  # R^T x: cam ray -> world
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    P_k = jnp.eye(3)[None] - jnp.einsum("ki,kj->kij", d, d)
    A = jax.ops.segment_sum(P_k, jnp.asarray(pt_idx), n_pts)
    b = jax.ops.segment_sum(
        jnp.einsum("kij,kj->ki", P_k, centers), jnp.asarray(pt_idx), n_pts
    )
    X = jnp.linalg.solve(A + 1e-9 * jnp.eye(3), b[..., None])[..., 0]
    return np.asarray(X)
