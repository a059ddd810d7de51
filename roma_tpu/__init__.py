"""roma_tpu — a TPU-native dense feature-matching + SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RoMa
(reference: /root/reference, Parskatt/RoMa CVPR'24 + NPU fork):

- dense warp + certainty prediction for image pairs (Tiny RoMa / full RoMa)
- balanced correspondence sampling
- robust two-view geometry (E/F/H estimation, RANSAC)
- MegaDepth / ScanNet / HPatches benchmark harnesses
- multi-device training via jax.sharding Mesh + shard_map
- distributed SfM backend (pose graph + bundle adjustment)

Design notes (TPU-first, not a port):
- NHWC layout everywhere (XLA-native conv layout); flows/warps are
  channels-last `(B, H, W, 2)`.
- static shapes: resolutions come from a small preset table
  (`roma_tpu.config.RESOLUTION_PRESETS`) so everything jits once.
- bfloat16 compute / float32 params & statistics.
- hot quadratic ops (4D correlation volume, softmax-expectation,
  local-window correlation, GP solve) have Pallas kernels under
  `roma_tpu.ops.pallas` with XLA fallbacks in `roma_tpu.ops`.
"""

__version__ = "0.1.0"
