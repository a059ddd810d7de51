from roma_tpu.ops.pallas.corr_softmax import fused_pos_embed
