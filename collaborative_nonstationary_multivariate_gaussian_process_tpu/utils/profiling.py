"""Lightweight observability: phase timers, memory probe, profiler hooks.

The reference's tracing subsystem is wall-clock `time.time()` deltas around
named phases gated by `verbose` ("reparameterization costs ...",
nmgp_dsvi.py:161-260) plus an RSS probe printed with the ELBO
(`print_mem`, nmgp_dsvi.py:26-32).  This module provides the same two
facilities in structured form, and adds what a TPU deployment actually
wants: `jax.profiler` trace capture around a region (XLA/TPU timeline in
TensorBoard format) and per-device memory stats.

Note on semantics under jit: a `PhaseTimer` around *traced* code measures
trace/compile+dispatch time, not device time — time whole jitted calls (with
`block_until_ready`) or use `trace` for the real device timeline.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

__all__ = [
    "PhaseTimer",
    "rss_mb",
    "print_mem",
    "trace",
    "device_memory_stats",
    "flops_of_jitted",
    "peak_flops_per_s",
]


def rss_mb() -> float:
    """Resident-set size of this process in MiB (reference `print_mem`,
    nmgp_dsvi.py:26-32, without the psutil dependency)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return float("nan")


def print_mem(epoch: Optional[int] = None) -> float:
    """Print and return current RSS in MiB (reference prints it alongside
    the periodic ELBO probe, nmgp_dsvi.py:888)."""
    mb = rss_mb()
    prefix = f"epoch: {epoch}, " if epoch is not None else ""
    print(f"{prefix}memory usage: {mb:.1f} MiB")
    return mb


@dataclass
class PhaseTimer:
    """Named-phase wall-clock accumulator.

        timer = PhaseTimer(verbose=True)
        with timer.phase("reparameterization"):
            ...
        timer.report()

    Matches the reference's per-phase verbose prints (nmgp_dsvi.py:161-260)
    but accumulates across entries so epoch loops aggregate for free.
    """

    verbose: bool = False
    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)
    _order: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.totals:
                self.totals[name] = 0.0
                self.counts[name] = 0
                self._order.append(name)
            self.totals[name] += dt
            self.counts[name] += 1
            if self.verbose:
                print(f"{name} costs {dt:.4f}s")

    def report(self) -> str:
        lines = [
            f"{name}: {self.totals[name]:.4f}s over {self.counts[name]} calls"
            for name in self._order
        ]
        out = "\n".join(lines)
        if self.verbose and out:
            print(out)
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (TensorBoard `trace_viewer`
    format) around a region — the TPU-native replacement for the
    reference's wall-clock prints: shows per-op device time, HBM traffic,
    and fusion boundaries."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_of_jitted(fn, *args, **kwargs) -> float:
    """FLOPs of ONE invocation of a jitted function, via XLA HLO cost
    analysis of the compiled executable.

    Caveat that shapes how benches must use this: XLA's HloCostAnalysis
    visits a While/Scan body ONCE (it does not multiply by trip count), so
    cost-analyze a single train step and multiply by measured steps/s —
    never cost-analyze the fused multi-epoch scan.

    Returns NaN when the backend exposes no cost model (e.g. some remote
    PJRT plugins)."""
    try:
        lowered = fn.lower(*args, **kwargs)
    except Exception:
        return float("nan")
    for get in (
        lambda: lowered.compile().cost_analysis(),
        lambda: lowered.cost_analysis(),
    ):
        try:
            ca = get()
        except Exception:
            continue
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca and "flops" in ca:
            return float(ca["flops"])
    return float("nan")


# Peak DENSE bf16 matmul FLOP/s per chip, public spec-sheet numbers.  The
# MFU convention reports achieved-FLOPs / bf16-dense-peak even for f32
# compute (f32 runs at <= half this rate through the MXU, so f32 MFU
# measured against the bf16 peak is a conservative utilization number).
_PEAK_FLOPS_PER_CHIP = {
    "v6e": 918e12,
    "v5p": 459e12,
    "v5e": 197e12,
    "v5 lite": 197e12,  # device_kind string for v5e on some runtimes
    "v4": 275e12,
}


def peak_flops_per_s() -> Optional[float]:
    """Peak bf16 dense FLOP/s of the attached accelerator chip, or None on
    CPU / unrecognized hardware (callers should then omit MFU)."""
    import jax

    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend
        return None
    kind = (getattr(d, "device_kind", "") or "").lower()
    for name, peak in _PEAK_FLOPS_PER_CHIP.items():
        if name in kind:
            return peak
    return None


def device_memory_stats():
    """Per-device live-buffer statistics (bytes), where the backend exposes
    them (TPU does; CPU returns {})."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", None)
        if callable(stats):
            try:
                s = stats()
            except Exception:
                s = None
            if s:
                out[str(d)] = {
                    k: v
                    for k, v in s.items()
                    if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                }
    return out
