"""Multi-host evaluation sharding: shard unions must reproduce the full run."""

import numpy as np

from roma_tpu.benchmarks.megadepth_pose import (
    MegaDepthPoseEstimationBenchmark,
    summarize_pose_errors,
)
from tests.test_benchmarks import OracleMatcher, two_plane_homographies


def test_sharded_benchmark_union_matches_full(mega_scene_dir):
    homs = [two_plane_homographies(i) for i in range(3)]

    def run(shard):
        np.random.seed(0)  # the 5x shuffles use global np.random; pin it
        bench = MegaDepthPoseEstimationBenchmark(
            data_root=str(mega_scene_dir), scene_names=["scene.npz"],
            num_ransac_runs=1, sample_num=500, shard=shard,
        )
        # oracle call order must match the pairs the shard visits
        pair_homs = [homs[i] for i in range(3) if i % shard[1] == shard[0]]
        return bench.collect_errors(OracleMatcher(pair_homs or homs))

    full = run((0, 1))
    merged = run((0, 2)) + run((1, 2))
    assert len(full) == len(merged) == 3
    # each shard covers disjoint pairs; the union reproduces the summary
    s_full = summarize_pose_errors(np.asarray(sorted(full)))
    s_merged = summarize_pose_errors(np.asarray(sorted(merged)))
    np.testing.assert_allclose(s_full["auc_20"], s_merged["auc_20"], atol=0.05)
    assert all(e < 5 for e in merged)


# reuse the synthetic scene fixture
from tests.test_benchmarks import mega_scene_dir  # noqa: E402,F401
