from roma_tpu.estimation.essential import (
    decompose_essential,
    essential_8pt,
    estimate_essential_ransac,
    estimate_pose,
)
from roma_tpu.estimation.fivepoint import essential_5pt
from roma_tpu.estimation.homography import estimate_homography_ransac, homography_dlt
from roma_tpu.estimation.fundamental import (
    estimate_fundamental_ransac,
    estimate_pose_uncalibrated,
    fundamental_7pt,
    fundamental_8pt,
)
