"""Phase timing + throughput counters (SURVEY §5.1).

The reference's only observability was Progress bars and cout phase lines;
its validation was external timing tables (/root/reference/Tables/Real.csv).
Here every pipeline phase is timed, and the two numeric hot paths export
work counters so the bench can report:

  - sequences/s        (the BASELINE.json headline)
  - NW cells/s         (sum of l1*l2 over aligned pairs / align wall time)
  - classify rows/s    (candidate rows pushed through the classifier)
  - est. MFU           (achieved flops vs the chip's peak, rough)

Usage:
    with perf.phase("training"):
        ...
    perf.add("nw_cells", l1 @ l2)
    perf.report()   -> dict        perf.format_report() -> str
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

_phase_s: Dict[str, float] = defaultdict(float)
_phase_n: Dict[str, int] = defaultdict(int)
_counters: Dict[str, float] = defaultdict(float)
_t0 = time.time()

# v5e (TPU v5 lite) per-chip peaks, for MFU estimates only:
#   197 TFLOP/s bf16 MXU; ~0.8 TOP/s-ish VPU int32 (8x128 lanes, ~940 MHz,
#   treated as 1 op/lane/cycle => conservative).
PEAK_VPU_OPS = 0.96e12
PEAK_MXU_FLOPS = 197e12 / 2  # f32 one-pass


def reset() -> None:
    _phase_s.clear()
    _phase_n.clear()
    _counters.clear()
    global _t0
    _t0 = time.time()


@contextlib.contextmanager
def phase(name: str):
    t = time.time()
    try:
        yield
    finally:
        _phase_s[name] += time.time() - t
        _phase_n[name] += 1


def add(counter: str, amount: float) -> None:
    _counters[counter] += float(amount)


def counters() -> Dict[str, float]:
    return dict(_counters)


def phases() -> Dict[str, float]:
    return dict(_phase_s)


def report() -> dict:
    out: dict = {"wall_s": time.time() - _t0,
                 "phases_s": dict(_phase_s),
                 "phase_calls": dict(_phase_n),
                 "counters": dict(_counters)}
    align_s = _phase_s.get("align", 0.0)
    cells = _counters.get("nw_cells", 0.0)
    if align_s > 0 and cells > 0:
        out["nw_cells_per_s"] = cells / align_s
        # the wavefront kernel does ~30 int32 VPU ops per DP cell across the
        # 6 carried lanes (3 maxes, selects, adds, packing)
        out["nw_vpu_util_est"] = cells * 30 / align_s / PEAK_VPU_OPS
    cls_s = _phase_s.get("cluster", 0.0)
    rows = _counters.get("classify_rows", 0.0)
    if cls_s > 0 and rows > 0:
        out["classify_rows_per_s"] = rows / cls_s
    # Phase-A roofline: achieved HBM streaming rate of the absorb sweeps
    # vs the chip's ~819 GB/s (v5e). The sweep passes are u8 reads fused
    # with f32 compute, so bytes/s IS the roofline axis.
    acc_s = _phase_s.get("accumulate", 0.0)
    sweep_b = _counters.get("accum_sweep_bytes", 0.0)
    if acc_s > 0 and sweep_b > 0:
        out["accum_gbps"] = sweep_b / acc_s / 1e9
        out["accum_hbm_util_est"] = sweep_b / acc_s / 819e9
        # the same sweeps as MXU work (~2 flops per streamed byte: the
        # abs-diff/madd per u8 element) — reported so the roofline gap is
        # visibly HBM, not MXU (verdict r4 #8)
        out["accum_mxu_util_est"] = 2.0 * sweep_b / acc_s / PEAK_MXU_FLOPS
    feat_s = _phase_s.get("feat_device", 0.0)
    feat_f = _counters.get("feat_matmul_flops", 0.0)
    if feat_s > 0 and feat_f > 0:
        out["feat_mxu_util_est"] = feat_f / feat_s / PEAK_MXU_FLOPS
    return out


def format_report() -> str:
    r = report()
    lines = [f"total wall: {r['wall_s']:.2f}s"]
    for k, v in sorted(r["phases_s"].items(), key=lambda kv: -kv[1]):
        lines.append(f"  phase {k:<14s} {v:8.2f}s  x{r['phase_calls'][k]}")
    for k, v in sorted(r["counters"].items()):
        lines.append(f"  counter {k:<18s} {v:.3g}")
    for k in ("nw_cells_per_s", "nw_vpu_util_est", "classify_rows_per_s",
              "accum_gbps", "accum_hbm_util_est", "accum_mxu_util_est",
              "feat_mxu_util_est"):
        if k in r:
            lines.append(f"  {k}: {r[k]:.3g}")
    return "\n".join(lines)
