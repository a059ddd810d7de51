"""Train full RoMa on MegaDepth (TPU data-parallel).

Recipe per the reference (/root/reference/experiments/train_roma_outdoor.py):
two overlap bands (0.01/0.35) with shake_t=32 + flip aug, RobustLosses with
alpha=0.5, c=1e-4, local_dist {1:4, 2:4, 4:8, 8:8}, AdamW groups (CNN encoder
at 5e-6/8 per sample, decoder at 1e-4/8), grad clip 0.01, milestone decay at
90% of 8M samples. Training runs single-pass at the coarse resolution (the
reference never trains the upsample pass).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse

import jax

from roma_tpu.config import RomaConfig, TrainConfig
from roma_tpu.datasets.loader import PairLoader, weighted_pair_iterator
from roma_tpu.datasets.megadepth import MegadepthBuilder
from roma_tpu.losses.robust_loss import RobustLossConfig, robust_loss
from roma_tpu.parallel.mesh import (
    global_batch_from_host_local,
    initialize_distributed,
    make_mesh,
    replicate,
)
from roma_tpu.train.checkpoint import CheckPoint
from roma_tpu.train.logging import MetricsLogger
from roma_tpu.train.train import make_roma_train_state, make_train_step, train_k_steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--checkpoint_dir", default="workspace/checkpoints")
    p.add_argument("--log_dir", default="workspace/logs")
    p.add_argument("--train_resolution", type=int, default=560)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_samples", type=int, default=8_000_000)
    p.add_argument("--eval_every", type=int, default=25_000)
    args = p.parse_args()

    hw = (args.train_resolution, args.train_resolution)
    assert hw[0] % 14 == 0
    proc, nproc = initialize_distributed()  # no-op single-host
    cfg = TrainConfig(batch_size=args.batch_size, steps=args.total_samples)
    mesh = make_mesh()
    name = "roma_outdoor"

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

    mega = MegadepthBuilder(data_root=args.data_root)
    scenes = mega.build_scenes(
        split="train_loftr", min_overlap=0.01, ht=hw[0], wt=hw[1], shake_t=32,
        use_horizontal_flip_aug=True, normalize=True,
    ) + mega.build_scenes(
        split="train_loftr", min_overlap=0.35, ht=hw[0], wt=hw[1], shake_t=32,
        use_horizontal_flip_aug=True, normalize=True,
    )
    ws = mega.weight_scenes(scenes, alpha=0.75)
    loader = PairLoader(
        weighted_pair_iterator(
            scenes, ws, cfg.batch_size // nproc, seed=cfg.seed, host_id=proc
        ),
        prefetch=4, num_threads=8,
    )

    k = max(1, args.eval_every // cfg.batch_size)
    while int(state.step) < args.total_samples:
        state = train_k_steps(
            state, loader, step, k, logger,
            device_put=lambda b: global_batch_from_host_local(b, mesh),
        )
        ckpt.save(state)
        print(f"step {int(state.step)}: checkpointed")
    ckpt.wait()
    logger.close()


if __name__ == "__main__":
    main()
