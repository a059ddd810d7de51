from roma_tpu.models.xfeat import XFeatBackbone
from roma_tpu.models.tiny_roma import TinyRoma, TinyRomaMatcher
