"""Model export + deployment tooling.

TPU-native counterpart of the reference fork's ONNX export path
(/root/reference/experiments/export_tiny.py: torch.onnx + onnxsim + thop
FLOPs audit): serialize a jitted matcher forward to portable StableHLO bytes
(`jax.export`), AOT-compile for the current device, and report the compiler's
FLOP/memory cost analysis (the thop-equivalent audit).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ExportResult:
    serialized: bytes            # portable StableHLO (jax.export) artifact
    flops: float | None          # compiler-estimated forward FLOPs
    bytes_accessed: float | None
    peak_memory: float | None


def export_tiny_roma(
    params,
    hw: tuple[int, int] = (320, 640),
    cfg=None,
    path: str | None = None,
) -> ExportResult:
    """Serialize the Tiny RoMa forward at a fixed shape."""
    from roma_tpu.config import TinyRomaConfig
    from roma_tpu.models.tiny_roma import TinyRoma

    cfg = cfg or TinyRomaConfig()
    model = TinyRoma(cfg)

    def fwd(p, a, b):
        c = model.apply(p, a, b, train=False)
        return c[8]["flow"], c[8]["certainty"], c[4]["flow"], c[4]["certainty"]

    spec = jnp.zeros((1, *hw, 3), jnp.float32)
    return export_function(fwd, (params, spec, spec), path=path)


def export_function(fn, example_args, path: str | None = None) -> ExportResult:
    """Generic: jit + lower + serialize + cost-analyze a function."""
    jitted = jax.jit(fn)
    lowered = jitted.lower(*example_args)
    exported = jax.export.export(jitted)(*example_args)
    blob = exported.serialize()

    flops = bytes_accessed = peak = None
    try:
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost:
            flops = float(cost.get("flops", float("nan")))
            bytes_accessed = float(cost.get("bytes accessed", float("nan")))
        mem = compiled.memory_analysis()
        if mem is not None:
            peak = float(getattr(mem, "temp_size_in_bytes", 0))
    except Exception:
        pass

    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return ExportResult(blob, flops, bytes_accessed, peak)


def load_exported(blob: bytes):
    """Deserialize and return a callable running the exported computation."""
    exported = jax.export.deserialize(blob)
    return lambda *args: exported.call(*args)
