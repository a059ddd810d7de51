from roma_tpu.datasets.megadepth import MegadepthBuilder, MegadepthScene
from roma_tpu.datasets.scannet import ScanNetBuilder, ScanNetScene
from roma_tpu.datasets.loader import PairLoader, weighted_pair_iterator
