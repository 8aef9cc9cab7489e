"""Accelerator capability detection/report.

Analog of the reference's CPU feature detection (common/cpu.cpp
x265::cpu_detect + names table -> param->cpuid): on this framework the
"SIMD capability" is the attached accelerator set, reported once at
startup the way x265 logs its detected CPU capabilities.
"""
from __future__ import annotations

from typing import List


def detect() -> List[dict]:
    import jax
    out = []
    for d in jax.devices():
        info = {
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "unknown"),
        }
        try:
            stats = d.memory_stats() or {}
            if "bytes_limit" in stats:
                info["hbm_gib"] = round(stats["bytes_limit"] / 2**30, 2)
        except Exception:
            pass
        out.append(info)
    return out


def capability_line() -> str:
    """x265-style one-line capability report."""
    devs = detect()
    parts = [f"{d['platform']}:{d['kind']}" +
             (f" {d['hbm_gib']}GiB" if "hbm_gib" in d else "")
             for d in devs]
    return "detected devices: " + ", ".join(parts)
