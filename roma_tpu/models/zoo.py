"""Model factories (reference model_zoo/__init__.py:16-73).

Outdoor/indoor full RoMa share one architecture (the reference factories
differ only in which checkpoint URL they pull, model_zoo/__init__.py:30-73);
resolution presets follow the shipped defaults (coarse 560, upsample 864).
Checkpoints load from local files via `load_torch_checkpoint` — this
environment has no network egress, so factories accept `params=None` and
return randomly-initialized models when no weights are provided.
"""

from __future__ import annotations

import dataclasses
import os

import jax

from roma_tpu.utils.profiling import enable_compilation_cache

if not os.environ.get("ROMA_TPU_NO_COMPILE_CACHE"):
    # on this runtime compiles tunnel to a remote TPU and take minutes;
    # factories are the entry point of every CLI, so turn the persistent
    # cache on here (opt out via ROMA_TPU_NO_COMPILE_CACHE=1)
    enable_compilation_cache()

from roma_tpu.config import RomaConfig, TinyRomaConfig, RefinerConfig
from roma_tpu.models.matcher import RomaMatcher
from roma_tpu.models.tiny_roma import TinyRomaMatcher


def roma_outdoor(
    params=None,
    coarse_res: int | tuple[int, int] = 560,
    upsample_res: int | tuple[int, int] = 864,
    seed: int = 0,
    smooth_warp_gather: bool | str = False,
) -> RomaMatcher:
    """`smooth_warp_gather`: tri-state (RomaConfig.smooth_warp_gather) —
    False keeps the packed-gather warp; True/"exact" routes scale-1 warps
    through the windowed kernel with a proven lax.cond fallback; "fast"
    runs it unconditionally (window-clamped on rough tiles — the
    trained-weight deployment mode, see ops/pallas/windowed_sample.py)."""
    if isinstance(coarse_res, int):
        coarse_res = (coarse_res, coarse_res)
    if isinstance(upsample_res, int):
        upsample_res = (upsample_res, upsample_res)
    assert coarse_res[0] % 14 == 0 and coarse_res[1] % 14 == 0, (
        "coarse resolution must be a multiple of 14 (ViT-L/14 patches)"
    )
    cfg = RomaConfig(
        coarse_resolution=coarse_res, upsample_resolution=upsample_res,
        smooth_warp_gather=smooth_warp_gather,
    )
    if params is not None:
        return RomaMatcher(params, cfg)
    return RomaMatcher.init(jax.random.PRNGKey(seed), cfg)


# same architecture; kept as a distinct name for checkpoint parity with the
# reference's indoor factory
roma_indoor = roma_outdoor


def tiny_roma_v1_outdoor(params=None, seed: int = 0) -> TinyRomaMatcher:
    if params is not None:
        return TinyRomaMatcher(params)
    return TinyRomaMatcher.init(jax.random.PRNGKey(seed))


def debug_roma_config() -> RomaConfig:
    """Scaled-down full-RoMa for tests: same topology, tiny depths/widths."""
    return RomaConfig(
        coarse_resolution=(112, 112),
        upsample_resolution=(224, 224),
        dinov2_depth=2,
        num_decoder_blocks=1,
        refiners={
            "16": RefinerConfig(2 * 512 + 128 + 15 * 15, 2 * 512 + 128 + 15 * 15, 128, 7, hidden_blocks=1),
            "8": RefinerConfig(2 * 512 + 64 + 7 * 7, 2 * 512 + 64 + 7 * 7, 64, 3, hidden_blocks=1),
            "4": RefinerConfig(2 * 256 + 32 + 5 * 5, 2 * 256 + 32 + 5 * 5, 32, 2, hidden_blocks=1),
            "2": RefinerConfig(2 * 64 + 16, 128 + 16, 16, None, hidden_blocks=1),
            "1": RefinerConfig(2 * 9 + 6, 24, 6, None, hidden_blocks=1),
        },
    )
