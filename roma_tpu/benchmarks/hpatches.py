"""HPatches homography benchmark.

Protocol per the reference (/root/reference/romatch/benchmarks/
hpatches_sequences_homog_benchmark.py): per sequence, match 1.ppm against
2..6.ppm, fit a homography by RANSAC at threshold 3*min(w2,h2)/480 on 5000
sampled matches, score by corner-transfer error normalized by min-dim/480,
AUC@{3,5,10}. HPatches GT homographies use [0, n-1] pixel centers (the 0.5
offset, :34).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

import jax

from roma_tpu.utils.geometry import pose_auc
from roma_tpu.estimation.homography import estimate_homography_ransac

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

IGNORE_SEQS = {
    "i_contruction", "i_crownnight", "i_dc", "i_pencils", "i_whitebuilding",
    "v_artisans", "v_astronautis", "v_talent",
}


class HpatchesHomogBenchmark:
    def __init__(
        self,
        dataset_path: str,
        homography_backend: str = "auto",
        sample_num: int = 5000,
        shard: tuple[int, int] = (0, 1),
    ) -> None:
        self.seqs_path = os.path.join(dataset_path, "hpatches-sequences-release")
        self.seq_names = sorted(os.listdir(self.seqs_path))
        self.use_cv2 = homography_backend == "cv2" or (
            homography_backend == "auto" and cv2 is not None
        )
        self.sample_num = sample_num
        self.shard = shard

    def _fit_homography(self, pos_a, pos_b, thresh):
        if self.use_cv2:
            H_pred, _ = cv2.findHomography(
                pos_a, pos_b, method=cv2.RANSAC, confidence=0.99999,
                ransacReprojThreshold=thresh,
            )
            return H_pred
        res = estimate_homography_ransac(pos_a, pos_b, threshold_px=thresh)
        return None if res is None else res.model

    def benchmark(self, matcher, model_name: str | None = None) -> dict:
        homog_dists = []
        key = jax.random.PRNGKey(0)
        for seq_idx, seq_name in enumerate(self.seq_names):
            if seq_idx % self.shard[1] != self.shard[0]:
                continue
            im_a = Image.open(os.path.join(self.seqs_path, seq_name, "1.ppm"))
            w1, h1 = im_a.size
            for im_idx in range(2, 7):
                im_b = Image.open(
                    os.path.join(self.seqs_path, seq_name, f"{im_idx}.ppm")
                )
                w2, h2 = im_b.size
                H_gt = np.loadtxt(
                    os.path.join(self.seqs_path, seq_name, f"H_1_{im_idx}")
                )
                # PIL straight to the matcher (host resize, O(1) compiles)
                warp, certainty = matcher.match(im_a, im_b)
                key, sub = jax.random.split(key)
                sparse, _ = matcher.sample(warp, certainty, self.sample_num, key=sub)
                sparse = np.asarray(sparse)
                offset = 0.5
                pos_a = np.stack(
                    (w1 * (sparse[:, 0] + 1) / 2 - offset,
                     h1 * (sparse[:, 1] + 1) / 2 - offset), axis=-1,
                )
                pos_b = np.stack(
                    (w2 * (sparse[:, 2] + 1) / 2 - offset,
                     h2 * (sparse[:, 3] + 1) / 2 - offset), axis=-1,
                )
                try:
                    H_pred = self._fit_homography(
                        pos_a, pos_b, 3 * min(w2, h2) / 480
                    )
                except Exception:  # noqa: BLE001
                    H_pred = None
                if H_pred is None:
                    H_pred = np.eye(3) * np.array([0, 0, 1.0])[None]
                corners = np.array(
                    [[0, 0, 1], [0, h1 - 1, 1], [w1 - 1, 0, 1], [w1 - 1, h1 - 1, 1]],
                    np.float64,
                )
                real = corners @ H_gt.T
                real = real[:, :2] / real[:, 2:]
                pred = corners @ H_pred.T
                pred = pred[:, :2] / np.where(np.abs(pred[:, 2:]) < 1e-12, 1e-12, pred[:, 2:])
                homog_dists.append(
                    float(np.mean(np.linalg.norm(real - pred, axis=1)) / (min(w2, h2) / 480))
                )
        thresholds = list(range(1, 11))
        auc = pose_auc(np.array(homog_dists), thresholds)
        return {
            "hpatches_homog_auc_3": auc[2],
            "hpatches_homog_auc_5": auc[4],
            "hpatches_homog_auc_10": auc[9],
        }
