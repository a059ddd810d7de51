"""Torch-checkpoint -> flax parameter porting helpers.

The reference distributes weights as torch state_dicts
(model_zoo/__init__.py:5-14). These helpers convert tensor layouts
(torch conv OIHW -> flax HWIO, linear (O,I) -> (I,O), BatchNorm running
stats -> flax batch_stats) so checkpoints can be loaded when available.
No network access is assumed; porting operates on local files only.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (O, I) -> flax (I, O)."""
    return np.transpose(np.asarray(w), (1, 0))


def set_in(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def port_conv(state: Mapping[str, Any], prefix: str, params: dict, path: tuple[str, ...]):
    set_in(params, path + ("kernel",), conv_kernel(state[f"{prefix}.weight"]))
    if f"{prefix}.bias" in state:
        set_in(params, path + ("bias",), np.asarray(state[f"{prefix}.bias"]))


def port_batchnorm(
    state: Mapping[str, Any],
    prefix: str,
    params: dict,
    batch_stats: dict,
    path: tuple[str, ...],
):
    set_in(batch_stats, path + ("mean",), np.asarray(state[f"{prefix}.running_mean"]))
    set_in(batch_stats, path + ("var",), np.asarray(state[f"{prefix}.running_var"]))
    if f"{prefix}.weight" in state:
        set_in(params, path + ("scale",), np.asarray(state[f"{prefix}.weight"]))
        set_in(params, path + ("bias",), np.asarray(state[f"{prefix}.bias"]))


def port_conv_block(
    state: Mapping[str, Any],
    conv_prefix: str,
    bn_prefix: str,
    params: dict,
    batch_stats: dict,
    block_path: tuple[str, ...],
):
    """One reference BasicLayer (conv + BN [+ relu]) -> one ConvBlock."""
    port_conv(state, conv_prefix, params, block_path + ("Conv_0",))
    port_batchnorm(state, bn_prefix, params, batch_stats, block_path + ("BatchNorm_0",))
