"""End-to-end multi-view reconstruction: dense matching -> pose graph ->
tracks -> triangulation -> (distributed) bundle adjustment.

The full SfM pipeline of the north star (BASELINE.json): pairwise RoMa
matches feed two-view E-RANSAC; global rotations/translations come from
averaging; tracks are fused and triangulated; Schur-complement BA polishes.
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np

import jax

from roma_tpu.estimation.essential import estimate_pose
from roma_tpu.sfm.bundle_adjust import (
    BAProblem,
    bundle_adjust,
    rodrigues,
    triangulate_tracks,
)
from roma_tpu.sfm.pose_graph import (
    centers_to_translations,
    rotation_averaging,
    translation_averaging,
)
from roma_tpu.sfm.tracks import TrackBuilder


@dataclasses.dataclass
class Reconstruction:
    rotations: np.ndarray      # (n, 3, 3) world2cam
    translations: np.ndarray   # (n, 3)
    points: np.ndarray         # (m, 3)
    cost: float

    @property
    def centers(self) -> np.ndarray:
        return -np.einsum("nji,nj->ni", self.rotations, self.translations)


def _rvec_from_R(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle (numerically safe log map)."""
    cos = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-8:
        return np.zeros(3)
    w = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2 * np.sin(theta))
    )
    return w * theta


def reconstruct(
    matches: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]],
    intrinsics: np.ndarray,
    n_images: int,
    ransac_thresh: float = 1e-3,
    ba_iters: int = 25,
    cell_px: float = 4.0,
    min_track_length: int = 2,
    rng: np.random.Generator | None = None,
) -> Reconstruction:
    """matches: {(i, j): (kpts_i px (N,2), kpts_j px (N,2))} pairwise
    correspondences (from `matcher.match` + `sample` + pixel conversion).
    intrinsics: (n_images, 3, 3). Returns the refined reconstruction
    (gauge: camera 0 at identity, unit-ish baseline scale)."""
    rng = rng or np.random.default_rng(0)

    # two-view geometry on every matched pair
    edges_R, edges_t = [], []
    tb = TrackBuilder(cell_px=cell_px)
    for (i, j), (ki, kj) in matches.items():
        ret = estimate_pose(
            ki, kj, intrinsics[i], intrinsics[j], ransac_thresh, rng=rng
        )
        if ret is None:
            continue
        R_ij, t_ij, inl = ret
        edges_R.append((i, j, R_ij))
        edges_t.append((i, j, t_ij[:, 0]))
        tb.add_matches(i, j, ki[inl], kj[inl])

    if not edges_R:
        raise ValueError("no usable two-view geometries")

    # global initialization
    Rs = rotation_averaging(n_images, edges_R)
    centers = translation_averaging(n_images, Rs, edges_t)
    ts = centers_to_translations(Rs, centers)

    # tracks -> observation table
    tracks = tb.build(min_length=min_track_length)
    cam_idx, pt_idx, uv = [], [], []
    for p, tr in enumerate(tracks):
        for img, xy in tr.obs.items():
            cam_idx.append(img)
            pt_idx.append(p)
            uv.append(xy)
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    uv = np.asarray(uv, np.float32)

    cameras = np.concatenate(
        [np.stack([_rvec_from_R(R) for R in Rs]), ts], axis=-1
    ).astype(np.float32)
    X0 = triangulate_tracks(cameras, intrinsics, cam_idx, pt_idx, uv, len(tracks))

    problem = BAProblem(
        cameras=jax.numpy.asarray(cameras),
        points=jax.numpy.asarray(X0.astype(np.float32)),
        intrinsics=jax.numpy.asarray(intrinsics.astype(np.float32)),
        cam_idx=jax.numpy.asarray(cam_idx),
        pt_idx=jax.numpy.asarray(pt_idx),
        uv=jax.numpy.asarray(uv),
        mask=jax.numpy.ones(len(uv), jax.numpy.float32),
    )
    # badly-triangulated observations (behind a camera / reprojection error
    # beyond 32 px at init) are mask-gated out and periodically re-admitted
    problem, cost = bundle_adjust(
        problem, iters=ba_iters, huber_delta=4.0, max_err_px=32.0
    )

    cams = np.asarray(problem.cameras)
    Rs_out = np.stack([np.asarray(rodrigues(c[:3])) for c in cams])
    return Reconstruction(
        rotations=Rs_out,
        translations=cams[:, 3:],
        points=np.asarray(problem.points),
        cost=cost,
    )
