from roma_tpu.estimation.essential import (
    decompose_essential,
    essential_8pt,
    estimate_essential_ransac,
    estimate_pose,
)
from roma_tpu.estimation.homography import estimate_homography_ransac, homography_dlt
from roma_tpu.estimation.fundamental import estimate_fundamental_ransac, fundamental_8pt
