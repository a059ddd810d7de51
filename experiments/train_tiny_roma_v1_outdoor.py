"""Train Tiny RoMa v1 on MegaDepth (TPU data-parallel).

Recipe per the reference experiment
(/root/reference/experiments/train_tiny_roma_v1_outdoor.py): MegaDepth
train_loftr split at two overlap bands (0.01 and 0.35), shake_t=32,
horizontal-flip aug, 1/n^0.75 scene weighting, AdamW lr 1e-4/8 per sample,
grad clip 0.01, milestone decay at 90% of 8M samples, checkpoints every 25k
samples, dense-benchmark eval between rounds. bf16 on TPU — no GradScaler.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse
import os

import numpy as np

import jax

from roma_tpu.config import TrainConfig
from roma_tpu.datasets.loader import PairLoader, weighted_pair_iterator
from roma_tpu.datasets.megadepth import MegadepthBuilder
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.parallel.mesh import (
    global_batch_from_host_local,
    initialize_distributed,
    make_mesh,
    replicate,
)
from roma_tpu.train.checkpoint import CheckPoint
from roma_tpu.train.logging import MetricsLogger
from roma_tpu.train.train import make_tiny_train_state, make_train_step, train_k_steps

RESOLUTIONS = {
    "low": (448, 448), "medium": (560, 560), "high": (672, 672),
    "xfeat": (600, 800), "big": (768, 1024),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--checkpoint_dir", default="workspace/checkpoints")
    p.add_argument("--log_dir", default="workspace/logs")
    p.add_argument("--train_resolution", default="big")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_samples", type=int, default=8_000_000)
    p.add_argument("--eval_every", type=int, default=25_000)
    p.add_argument("--only_test", action="store_true")
    p.add_argument("--train_fine_matcher", action="store_true",
                   help="staged training: freeze trunk+coarse, train the fine"
                        " matcher only (fork recipe, model_tiny2.py:669-684)")
    p.add_argument("--freeze_xfeat", action="store_true",
                   help="freeze the XFeat trunk, train both matchers")
    p.add_argument("--checkpoint", default=None,
                   help="warm-start from a reference torch .pth (ported)")
    args = p.parse_args()

    proc, nproc = initialize_distributed()  # no-op single-host
    h, w = RESOLUTIONS[args.train_resolution]
    h, w = (h // 32) * 32, (w // 32) * 32  # tiny preprocessing contract
    cfg = TrainConfig(batch_size=args.batch_size, steps=args.total_samples)
    mesh = make_mesh()
    name = "tiny_roma_v1_outdoor"

    trainable = ("fine_only" if args.train_fine_matcher
                 else "matchers_only" if args.freeze_xfeat else "all")
    state = make_tiny_train_state(
        jax.random.PRNGKey(cfg.seed), cfg, hw=(h, w), trainable=trainable
    )
    if args.checkpoint:
        import torch

        from roma_tpu.models.port import port_tiny_roma

        ported = port_tiny_roma(
            torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        )
        state = state.replace(
            params=ported["params"],
            batch_stats=ported.get("batch_stats", state.batch_stats),
        )
    ckpt = CheckPoint(args.checkpoint_dir, name)
    state = ckpt.load(state)
    state = replicate(state, mesh)

    loss_cfg = RobustLossConfig(
        ce_weight=0.01, local_dist={4: 4}, alpha={4: 0.15, 8: 0.15},
        c=1e-4, epe_mask_prob_th=0.001,
    )
    step = make_train_step(loss_fn=tiny_robust_loss, loss_cfg=loss_cfg, mesh=mesh)
    logger = MetricsLogger(args.log_dir, name)

    mega = MegadepthBuilder(data_root=args.data_root)
    scenes = mega.build_scenes(
        split="train_loftr", min_overlap=0.01, ht=h, wt=w, shake_t=32,
        use_horizontal_flip_aug=True,
    ) + mega.build_scenes(
        split="train_loftr", min_overlap=0.35, ht=h, wt=w, shake_t=32,
        use_horizontal_flip_aug=True,
    )
    ws = mega.weight_scenes(scenes, alpha=0.75)
    # each host loads only its slice of the global batch; the mesh-global
    # array is assembled in global_batch_from_host_local (DDP-sampler
    # equivalent, reference megadepth.py:52-57 rank striding)
    loader = PairLoader(
        weighted_pair_iterator(
            scenes, ws, cfg.batch_size // nproc, seed=cfg.seed, host_id=proc
        ),
        prefetch=4, num_threads=8,
    )

    k = max(1, args.eval_every // cfg.batch_size)
    while int(state.step) < args.total_samples and not args.only_test:
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
