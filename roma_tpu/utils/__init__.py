from roma_tpu.utils.geometry import (
    get_grid,
    normalized_to_pixel,
    pixel_to_normalized,
    warp_to_pixel_coordinates,
    cls_to_flow,
    cls_to_flow_refine,
    warp_kpts,
    get_gt_warp,
    compute_relative_pose,
    angle_error_mat,
    angle_error_vec,
    compute_pose_error,
    pose_auc,
)
from roma_tpu.utils.kde import kde
from roma_tpu.utils.sampling import sample_matches
