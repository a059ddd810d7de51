"""Train full RoMa indoor: MegaDepth + ScanNet interleaved 1:1.

Recipe per the reference (/root/reference/experiments/roma_indoor.py:220-278):
alternate one MegaDepth batch and one ScanNet batch per optimizer step, each
scored by its own loss instance (ScanNet depth is noisier — its variant keeps
the same hyperparameters but separate state), shared optimizer/schedule.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import itertools

import jax

from roma_tpu.config import RomaConfig, TrainConfig
from roma_tpu.datasets.loader import PairLoader, weighted_pair_iterator
from roma_tpu.datasets.megadepth import MegadepthBuilder
from roma_tpu.datasets.scannet import ScanNetBuilder
from roma_tpu.losses.robust_loss import RobustLossConfig, robust_loss
from roma_tpu.parallel.mesh import (
    global_batch_from_host_local,
    initialize_distributed,
    make_mesh,
    replicate,
)
from roma_tpu.train.checkpoint import CheckPoint
from roma_tpu.train.logging import MetricsLogger
from roma_tpu.train.train import make_roma_train_state, make_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--megadepth_root", default="data/megadepth")
    p.add_argument("--scannet_root", default="data/scannet")
    p.add_argument("--checkpoint_dir", default="workspace/checkpoints")
    p.add_argument("--log_dir", default="workspace/logs")
    p.add_argument("--train_resolution", type=int, default=560)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_samples", type=int, default=8_000_000)
    p.add_argument("--checkpoint_every", type=int, default=25_000)
    args = p.parse_args()

    hw = (args.train_resolution, args.train_resolution)
    proc, nproc = initialize_distributed()  # no-op single-host
    cfg = TrainConfig(batch_size=args.batch_size, steps=args.total_samples)
    mesh = make_mesh()
    name = "roma_indoor"

    state = make_roma_train_state(
        jax.random.PRNGKey(cfg.seed), cfg, roma_cfg=RomaConfig(), hw=hw
    )
    ckpt = CheckPoint(args.checkpoint_dir, name)
    state = ckpt.load(state)
    state = replicate(state, mesh)

    loss_cfg = RobustLossConfig(
        ce_weight=0.01, alpha=0.5, c=1e-4,
        local_dist={1: 4, 2: 4, 4: 8, 8: 8}, local_largest_scale=8,
    )
    step = make_train_step(loss_fn=robust_loss, loss_cfg=loss_cfg, mesh=mesh)
    logger = MetricsLogger(args.log_dir, name)

    mega = MegadepthBuilder(data_root=args.megadepth_root)
    mega_scenes = mega.build_scenes(
        split="train_loftr", min_overlap=0.01, ht=hw[0], wt=hw[1], shake_t=32,
        use_horizontal_flip_aug=True, normalize=True,
    )
    mega_loader = PairLoader(
        weighted_pair_iterator(
            mega_scenes, mega.weight_scenes(mega_scenes, alpha=0.75),
            cfg.batch_size // nproc, seed=cfg.seed, host_id=proc,
        ),
        prefetch=4, num_threads=4,
    )
    scannet = ScanNetBuilder(data_root=args.scannet_root)
    scan_scenes = scannet.build_scenes(
        ht=hw[0], wt=hw[1], use_horizontal_flip_aug=True, normalize=True
    )
    scan_loader = PairLoader(
        weighted_pair_iterator(
            scan_scenes, scannet.weight_scenes(scan_scenes, alpha=0.75),
            cfg.batch_size // nproc, seed=cfg.seed + 1, host_id=proc,
        ),
        prefetch=4, num_threads=4,
    )

    # 1:1 interleave (reference roma_indoor.py:272-278)
    mixed = itertools.chain.from_iterable(zip(mega_loader, scan_loader))
    next_ckpt = int(state.step) + args.checkpoint_every
    for batch in mixed:
        if int(state.step) >= args.total_samples:
            break
        state, metrics = step(state, global_batch_from_host_local(batch, mesh))
        logger.log(int(state.step), metrics)
        if int(state.step) >= next_ckpt:
            ckpt.save(state)
            next_ckpt += args.checkpoint_every
            print(f"step {int(state.step)}: checkpointed")
    ckpt.save(state)
    ckpt.wait()
    logger.close()


if __name__ == "__main__":
    main()
