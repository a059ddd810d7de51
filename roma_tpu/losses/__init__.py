from roma_tpu.losses.robust_loss import (
    RobustLossConfig,
    robust_loss,
    tiny_robust_loss,
)
