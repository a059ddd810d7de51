from roma_tpu.ops.resize import interpolate_bilinear, interpolate_nearest, resize_bicubic
from roma_tpu.ops.grid_sample import grid_sample, grid_sample_nearest
from roma_tpu.ops.corr import corr_volume, pos_embed_expectation, pos_embed_fast
from roma_tpu.ops.local_corr import local_correlation
