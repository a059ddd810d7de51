"""Profiling + roofline accounting (aux subsystem; SURVEY §5.1).

The reference has no in-repo tracing (its fork profiled on an external NPU
toolchain). Here: a trace contextmanager around `jax.profiler`, a wall-clock
timer that forces completion with a host readback (block_until_ready returns
early on the remote-TPU runtime used in this environment), and a roofline
report from the compiler's cost analysis vs. hardware peaks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# v5e-class defaults; override per deployment
PEAK_FLOPS_BF16 = 394e12 / 2
PEAK_HBM_BYTES_PER_S = 819e9


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache. On the remote-TPU runtime used here
    compiles tunnel through the network and take minutes; the on-disk cache
    cuts repeat startup (bench, eval CLIs, profilers) to seconds."""
    import os

    if path is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo_root, ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _readback_scalar(out) -> float:
    """Force execution with a 4-byte readback (block_until_ready can return
    early here; never pull full arrays over the tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Best wall-clock seconds per call, forcing completion via readback."""
    for _ in range(warmup):
        _ = _readback_scalar(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = _readback_scalar(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@dataclasses.dataclass
class Roofline:
    seconds: float
    flops: float | None
    bytes_accessed: float | None

    @property
    def achieved_tflops(self) -> float | None:
        return None if self.flops is None else self.flops / self.seconds / 1e12

    @property
    def mxu_utilization(self) -> float | None:
        t = self.achieved_tflops
        return None if t is None else t * 1e12 / PEAK_FLOPS_BF16

    @property
    def hbm_utilization(self) -> float | None:
        if self.bytes_accessed is None:
            return None
        return self.bytes_accessed / self.seconds / PEAK_HBM_BYTES_PER_S

    def report(self) -> str:
        parts = [f"{self.seconds * 1e3:.2f} ms"]
        if self.achieved_tflops is not None:
            parts.append(
                f"{self.achieved_tflops:.1f} TFLOP/s"
                f" ({100 * self.mxu_utilization:.0f}% MXU)"
            )
        if self.hbm_utilization is not None:
            parts.append(f"{100 * self.hbm_utilization:.0f}% HBM")
        return " | ".join(parts)


def roofline(fn, *args, iters: int = 5) -> Roofline:
    """Time a jitted fn and pair it with the compiler's cost analysis."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    seconds = timed(jitted, *args, iters=iters)
    flops = bytes_accessed = None
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost:
            flops = float(cost.get("flops", float("nan")))
            bytes_accessed = float(cost.get("bytes accessed", float("nan")))
    except Exception:
        pass
    return Roofline(seconds, flops, bytes_accessed)
