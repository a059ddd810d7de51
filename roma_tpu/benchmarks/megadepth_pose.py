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
- `batch_size > 1` switches to the TPU-first batched path: pairs are stacked
  on the batch axis through one jitted two-pass forward + vmapped sampling,
  host image load/resize runs on a prefetching thread pool, and the 5x
  RANSAC repetitions run on a worker pool overlapped with the next batch's
  matching (the reference loops pairs serially at batch 1,
  megadepth_pose_estimation_benchmark.py:33-42, leaving the accelerator
  idle during every host RANSAC call). RNG use (sampling keys, shuffle
  permutations) follows the exact serial order, so batched results are
  protocol-identical; the per-pair estimates only move at jit-batching
  numerics level.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

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
        batch_size: int = 1,
        workers: int = 8,
        device_resize: bool = False,
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
        self.batch_size = batch_size
        self.workers = workers
        # ship ORIGINAL-resolution uint8 + PIL-parity resize on device
        # (VERDICT r4 #3): ~3.5x fewer upload bytes on the ~38 MB/s tunnel.
        # Off by default: the host-PIL path is the bit-exact protocol
        # reference; device resize matches it to <=1 uint8 level.
        self.device_resize = device_resize

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

    def _pair_list(self) -> list[tuple]:
        """Pair metadata in protocol order, shard-strided:
        (path_a, path_b, K1, K2, R, t)."""
        items = []
        pair_counter = 0
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
                items.append((
                    os.path.join(self.data_root, im_paths[idx1]),
                    os.path.join(self.data_root, im_paths[idx2]),
                    K1, K2, R, t,
                ))
        return items

    def _rescale(self, K1, K2, w1, h1, w2, h2):
        """K-rescale to max-dim 1200 (paper protocol)."""
        s1, s2 = 1200 / max(w1, h1), 1200 / max(w2, h2)
        K1s, K2s = K1.copy(), K2.copy()
        K1s[:2] *= s1
        K2s[:2] *= s2
        return K1s, K2s, (s1 * w1, s1 * h1, s2 * w2, s2 * h2)

    def _estimate_reps(self, kpts1, kpts2, K1s, K2s, R, t, norm_threshold,
                       perms) -> list[float]:
        """The num_ransac_runs shuffled repetitions for one pair. Shuffles
        compose cumulatively (protocol: the arrays are shuffled in place each
        repetition). Thread-safe: pure numpy + the (GIL-releasing) estimator."""
        errs = []
        for shuffling in perms:
            kpts1, kpts2 = kpts1[shuffling], kpts2[shuffling]
            try:
                ret = self.estimate_pose(kpts1, kpts2, K1s, K2s, norm_threshold)
                if ret is None:
                    raise ValueError("pose estimation failed")
                R_est, t_est, _mask = ret
                T_est = np.concatenate((R_est, t_est.reshape(3, 1)), axis=-1)
                e_t, e_R = compute_pose_error(T_est, R, t)
                e_pose = max(e_t, e_R)
            except Exception as e:  # noqa: BLE001 — protocol: failures count 90 deg
                print(repr(e))
                e_pose = 90.0
            errs.append(float(e_pose))
        return errs

    def collect_errors(self, matcher) -> list[float]:
        """Raw per-repetition pose errors (merge across hosts, then AUC)."""
        if self.batch_size > 1:
            return self._collect_errors_batched(matcher)
        tot_e_pose: list[float] = []
        # seeded shuffle: the reference uses the process-global numpy RNG
        # (megadepth_pose_estimation_benchmark.py:77); a private generator
        # keeps the protocol (distinct shuffles per repetition) while making
        # results order-independent and reproducible
        shuffle_rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(0)
        for path_a, path_b, K1, K2, R, t in self._pair_list():
            im_a, w1, h1 = self._load_image(path_a)
            im_b, w2, h2 = self._load_image(path_b)
            warp, certainty = matcher.match(im_a, im_b)
            key, sub = jax.random.split(key)
            sparse, _ = matcher.sample(warp, certainty, self.sample_num, key=sub)
            sparse = np.asarray(sparse)

            K1s, K2s, (w1s, h1s, w2s, h2s) = self._rescale(K1, K2, w1, h1, w2, h2)
            kpts1 = np.asarray(
                matcher.to_pixel_coordinates(sparse[:, :2], h1s, w1s)
            )
            kpts2 = np.asarray(
                matcher.to_pixel_coordinates(sparse[:, 2:], h2s, w2s)
            )
            norm_threshold = 0.5 / (
                np.mean(np.abs(K1s[:2, :2])) + np.mean(np.abs(K2s[:2, :2]))
            )
            perms = [
                shuffle_rng.permutation(len(kpts1))
                for _ in range(self.num_ransac_runs)
            ]
            tot_e_pose.extend(self._estimate_reps(
                kpts1, kpts2, K1s, K2s, R, t, norm_threshold, perms
            ))
        return tot_e_pose

    def _collect_errors_batched(self, matcher) -> list[float]:
        """Batched path via the shared engine (harness_core.run_batched_eval):
        prefetching host load/prep -> stacked jitted match -> vmapped
        sampling -> threaded RANSAC. Identical RNG order to serial."""
        from roma_tpu.benchmarks.harness_core import run_batched_eval

        items = self._pair_list()
        shuffle_rng = np.random.default_rng(self.seed)

        def finish(idx, item, sparse, sizes):
            _pa, _pb, K1, K2, R, t = item
            w1, h1, w2, h2 = sizes
            K1s, K2s, (w1s, h1s, w2s, h2s) = self._rescale(
                K1, K2, w1, h1, w2, h2
            )
            norm_threshold = 0.5 / (
                np.mean(np.abs(K1s[:2, :2])) + np.mean(np.abs(K2s[:2, :2]))
            )
            # shared-RNG draws stay on the main thread (serial order); the
            # sparse VALUES resolve on the pool (np.asarray may device-fetch)
            perms = [
                shuffle_rng.permutation(sparse.shape[0])
                for _ in range(self.num_ransac_runs)
            ]

            def job():
                sp = np.asarray(sparse)
                kpts1 = np.asarray(
                    matcher.to_pixel_coordinates(sp[:, :2], h1s, w1s)
                )
                kpts2 = np.asarray(
                    matcher.to_pixel_coordinates(sp[:, 2:], h2s, w2s)
                )
                return self._estimate_reps(
                    kpts1, kpts2, K1s, K2s, R, t, norm_threshold, perms
                )

            return job, ()

        per_pair = run_batched_eval(
            matcher, items,
            paths=lambda it: (it[0], it[1]),
            finish=finish,
            sample_num=self.sample_num,
            batch_size=self.batch_size,
            workers=self.workers,
            device_resize=self.device_resize,
            sample_key=jax.random.PRNGKey(0),
        )
        out: list[float] = []
        for e in per_pair:
            out.extend(e)
        return out
