from roma_tpu.sfm.tracks import TrackBuilder, Track
from roma_tpu.sfm.pose_graph import rotation_averaging, translation_averaging
from roma_tpu.sfm.bundle_adjust import (
    BAProblem,
    bundle_adjust,
    bundle_adjust_cg_device,
    bundle_adjust_device,
    make_distributed_ba_step,
    triangulate_tracks,
)
from roma_tpu.sfm.metrics import align_umeyama, absolute_trajectory_error
