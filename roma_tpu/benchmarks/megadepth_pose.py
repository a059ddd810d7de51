"""MegaDepth-1500 relative-pose benchmark — the north-star metric harness.

Protocol byte-compatible with the reference
(/root/reference/romatch/benchmarks/megadepth_pose_estimation_benchmark.py):
5 scene npz's, 5000 sampled matches per pair, intrinsics rescaled to
max-dim 1200, 5 shuffled RANSAC repetitions at threshold
0.5 / (mean|K1| + mean|K2|), pose error max(e_t, e_R), AUC@{5,10,20}.

Differences (TPU-shaped, not protocol-changing):
- the matcher consumes arrays (the harness owns image IO), and every pair
  runs at the matcher's fixed jit resolution instead of per-image shapes
- `shard=(i, n)` strides the pair list for multi-host evaluation; partial
  results carry raw errors so hosts can be merged before the AUC reduction
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

import jax

from roma_tpu.utils.geometry import compute_pose_error, compute_relative_pose, pose_auc
from roma_tpu.benchmarks.pose_backends import get_pose_backend

DEFAULT_SCENES = [
    "0015_0.1_0.3.npz",
    "0015_0.3_0.5.npz",
    "0022_0.1_0.3.npz",
    "0022_0.3_0.5.npz",
    "0022_0.5_0.7.npz",
]
THRESHOLDS = [5, 10, 20]


def summarize_pose_errors(e_pose: np.ndarray) -> dict:
    auc = pose_auc(e_pose, THRESHOLDS)
    acc = {t: float((e_pose < t).mean()) for t in (5, 10, 15, 20)}
    return {
        "auc_5": auc[0],
        "auc_10": auc[1],
        "auc_20": auc[2],
        "map_5": acc[5],
        "map_10": float(np.mean([acc[5], acc[10]])),
        "map_20": float(np.mean([acc[5], acc[10], acc[15], acc[20]])),
    }


class MegaDepthPoseEstimationBenchmark:
    def __init__(
        self,
        data_root: str = "data/megadepth",
        scene_names: list[str] | None = None,
        pose_backend: str = "auto",
        sample_num: int = 5000,
        num_ransac_runs: int = 5,
        test_every: int = 1,
        shard: tuple[int, int] = (0, 1),
        seed: int = 0,
    ) -> None:
        self.seed = seed
        self.data_root = data_root
        self.scene_names = scene_names or DEFAULT_SCENES
        self.scenes = [
            np.load(os.path.join(data_root, s), allow_pickle=True)
            for s in self.scene_names
        ]
        self.estimate_pose = get_pose_backend(pose_backend)
        self.sample_num = sample_num
        self.num_ransac_runs = num_ransac_runs
        self.test_every = test_every
        self.shard = shard

    def _load_image(self, path: str) -> tuple["Image.Image", int, int]:
        # hand the matcher the PIL image: RomaMatcher then resizes on HOST
        # (PIL bicubic, the reference's torchvision-on-PIL protocol) so the
        # device graphs see only the fixed model resolutions — an eval over
        # hundreds of unique image sizes compiles O(1) times
        im = Image.open(path).convert("RGB")
        w, h = im.size
        return im, w, h

    def benchmark(self, matcher, model_name: str | None = None) -> dict:
        errors = self.collect_errors(matcher)
        return summarize_pose_errors(np.asarray(errors))

    def collect_errors(self, matcher) -> list[float]:
        """Raw per-repetition pose errors (merge across hosts, then AUC)."""
        tot_e_pose: list[float] = []
        # seeded shuffle: the reference uses the process-global numpy RNG
        # (megadepth_pose_estimation_benchmark.py:77); a private generator
        # keeps the protocol (distinct shuffles per repetition) while making
        # results order-independent and reproducible
        shuffle_rng = np.random.default_rng(self.seed)
        pair_counter = 0
        key = jax.random.PRNGKey(0)
        for scene in self.scenes:
            pairs = scene["pair_infos"]
            intrinsics = scene["intrinsics"]
            poses = scene["poses"]
            im_paths = scene["image_paths"]
            for pairind in range(0, len(pairs), self.test_every):
                pair_counter += 1
                if (pair_counter - 1) % self.shard[1] != self.shard[0]:
                    continue
                idx1, idx2 = pairs[pairind][0]
                K1 = np.array(intrinsics[idx1], np.float64).copy()
                K2 = np.array(intrinsics[idx2], np.float64).copy()
                T1 = np.array(poses[idx1])
                T2 = np.array(poses[idx2])
                R, t = compute_relative_pose(
                    T1[:3, :3], T1[:3, 3], T2[:3, :3], T2[:3, 3]
                )

                im_a, w1, h1 = self._load_image(
                    os.path.join(self.data_root, im_paths[idx1])
                )
                im_b, w2, h2 = self._load_image(
                    os.path.join(self.data_root, im_paths[idx2])
                )
                warp, certainty = matcher.match(im_a, im_b)
                key, sub = jax.random.split(key)
                sparse, _ = matcher.sample(warp, certainty, self.sample_num, key=sub)
                sparse = np.asarray(sparse)

                # K-rescale to max-dim 1200 (paper protocol)
                s1, s2 = 1200 / max(w1, h1), 1200 / max(w2, h2)
                w1s, h1s, w2s, h2s = s1 * w1, s1 * h1, s2 * w2, s2 * h2
                K1s, K2s = K1.copy(), K2.copy()
                K1s[:2] *= s1
                K2s[:2] *= s2

                kpts1 = np.asarray(
                    matcher.to_pixel_coordinates(sparse[:, :2], h1s, w1s)
                )
                kpts2 = np.asarray(
                    matcher.to_pixel_coordinates(sparse[:, 2:], h2s, w2s)
                )

                norm_threshold = 0.5 / (
                    np.mean(np.abs(K1s[:2, :2])) + np.mean(np.abs(K2s[:2, :2]))
                )
                for _rep in range(self.num_ransac_runs):
                    shuffling = shuffle_rng.permutation(len(kpts1))
                    kpts1, kpts2 = kpts1[shuffling], kpts2[shuffling]
                    try:
                        ret = self.estimate_pose(
                            kpts1, kpts2, K1s, K2s, norm_threshold
                        )
                        if ret is None:
                            raise ValueError("pose estimation failed")
                        R_est, t_est, _mask = ret
                        T_est = np.concatenate((R_est, t_est.reshape(3, 1)), axis=-1)
                        e_t, e_R = compute_pose_error(T_est, R, t)
                        e_pose = max(e_t, e_R)
                    except Exception as e:  # noqa: BLE001 — protocol: failures count 90 deg
                        print(repr(e))
                        e_pose = 90.0
                    tot_e_pose.append(float(e_pose))
        return tot_e_pose
