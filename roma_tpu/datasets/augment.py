"""Geometric / photometric augmentations (host-side, numpy/cv2).

Capability port of the reference's kornia-based utilities
(/root/reference/romatch/utils/transforms.py): paired RandomErasing that
blanks image AND depth together (:108-117), and in-plane rotation applied as
a homography with the intrinsics composed accordingly (GeometricSequential /
RandomAffine, :8-32 — used by the ScanNet recipe via rot_prob). Both are
default-off in the shipped reference configs, matching our defaults.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def random_erasing(
    im: np.ndarray,
    depth: np.ndarray,
    rng: np.random.Generator,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.1),
    ratio: tuple[float, float] = (0.3, 3.3),
) -> tuple[np.ndarray, np.ndarray]:
    """Blank one random rectangle in both image (H, W, 3) and depth (H, W) —
    erased pixels must drop out of the GT warp supervision too, hence the
    paired depth zeroing."""
    if rng.random() > p:
        return im, depth
    h, w = depth.shape
    area = h * w * rng.uniform(*scale)
    r = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
    eh = int(round(np.sqrt(area * r)))
    ew = int(round(np.sqrt(area / r)))
    eh, ew = min(eh, h - 1), min(ew, w - 1)
    if eh < 1 or ew < 1:
        return im, depth
    y = rng.integers(0, h - eh)
    x = rng.integers(0, w - ew)
    im = im.copy()
    depth = depth.copy()
    im[y : y + eh, x : x + ew] = 0.0
    depth[y : y + eh, x : x + ew] = 0.0
    return im, depth


def random_rotation(
    im: np.ndarray,
    depth: np.ndarray,
    K: np.ndarray,
    rng: np.random.Generator,
    max_deg: float = 90.0,
    p: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """In-plane rotation about the image center as a homography H; the
    intrinsics compose as K' = H K so depth-based GT warping stays
    consistent (pure in-plane rotation is depth-independent)."""
    if cv2 is None or rng.random() > p:
        return im, depth, K
    h, w = depth.shape
    ang = rng.uniform(-max_deg, max_deg)
    H2 = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
    H3 = np.eye(3)
    H3[:2] = H2
    im_r = cv2.warpAffine(im, H2, (w, h), flags=cv2.INTER_LINEAR)
    depth_r = cv2.warpAffine(depth, H2, (w, h), flags=cv2.INTER_NEAREST)
    return im_r, depth_r, H3 @ K
