#!/usr/bin/env python
"""Gated A/B probe helper for the r14 optimization round: measures
callables with the same exogenous-CPU discard rule bench.py uses, so
co-tenant bursts don't masquerade as regressions. Import `gated_best`
from probe scripts. Not part of the bench contract."""
from __future__ import annotations

import os
import time


def _busy() -> int:
    vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(vals) - vals[3] - (vals[4] if len(vals) > 4 else 0)


def _tree_cpu() -> int:
    me = os.getpid()
    procs = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat", "rb") as f:
                s = f.read().decode("ascii", "replace")
        except OSError:
            continue
        rp = s.rfind(")")
        fields = s[rp + 2:].split()
        procs[int(p)] = (int(fields[1]), int(fields[11]) + int(fields[12]))
    kids = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0, [me]
    while stack:
        pid = stack.pop()
        if pid in procs:
            total += procs[pid][1]
            stack.extend(kids.get(pid, []))
    return total


def gated_best(fn, n: int = 4, exo_limit: float = 0.10,
               max_extra: int = 6) -> tuple[float, int]:
    """min wall time over n samples whose exogenous-CPU fraction stays
    under exo_limit; returns (best, n_discarded)."""
    hz = os.sysconf("SC_CLK_TCK")
    ncpu = os.cpu_count() or 1
    best, kept, dropped = float("inf"), 0, 0
    while kept < n and dropped < n + max_extra:
        b0, o0 = _busy(), _tree_cpu()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        o1, b1 = _tree_cpu(), _busy()
        exo = max(0, (b1 - b0) - (o1 - o0)) / hz / (ncpu * dt)
        if exo > exo_limit:
            dropped += 1
            continue
        kept += 1
        best = min(best, dt)
    return best, dropped
