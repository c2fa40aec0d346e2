"""jax.profiler trace parsing: per-op device-time tables.

jax.profiler.trace works on the axon TPU platform and records device-side
XLA op events (pid '/device:TPU:0') into a perfetto trace.json.gz. These
helpers aggregate those events into per-op tables so measurement scripts
can commit evidence of WHERE step time goes (VERDICT r4 #1), not just
end-to-end medians.

Caveats:
- A Pallas kernel is one opaque custom-call event: the table shows its
  total per-launch cost, not its internals.
- Device timestamps cover only windows the device was executing; gaps
  between consecutive ops inside one program are scheduling/launch
  bubbles, reported as 'gap' when summarize(..., with_gaps=True).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def latest_trace_file(logdir: str) -> str:
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    return paths[-1]


def device_events(logdir: str) -> List[dict]:
    """Complete ('X') events on the TPU device track, sorted by ts."""
    with gzip.open(latest_trace_file(logdir)) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:TPU" in e.get("args", {}).get("name", "")
    }
    out = [e for e in evs
           if e.get("ph") == "X" and e.get("pid") in dev_pids]
    out.sort(key=lambda e: e["ts"])
    return out


def op_table(logdir: str, top: int = 0,
             exclude_prefixes: Tuple[str, ...] = ("jit_",),
             ) -> List[Dict]:
    """Aggregate device events by op name -> rows sorted by total time.

    Events whose name starts with an exclude prefix are dropped (the
    'jit_<fn>' envelope event overlaps all its child op events and would
    double-count). Returns [{name, total_ms, count, mean_us}]."""
    per = defaultdict(lambda: [0.0, 0])
    for e in device_events(logdir):
        name = e.get("name", "?")
        if any(name.startswith(p) for p in exclude_prefixes):
            continue
        per[name][0] += e.get("dur", 0.0)
        per[name][1] += 1
    rows = [
        {"name": n, "total_ms": round(t / 1000.0, 3), "count": c,
         "mean_us": round(t / max(c, 1), 1)}
        for n, (t, c) in per.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top] if top else rows


def window_breakdown(logdir: str, envelope_prefix: str = "jit_",
                     ) -> Dict:
    """Occupancy inside the outermost program envelopes.

    Finds events named '<envelope_prefix>*' (XLA emits one per executed
    program), sums their wall duration, the op time inside them, and the
    residual gap (device idle inside the program = serial launch bubbles).
    """
    evs = device_events(logdir)
    envs = [e for e in evs if e.get("name", "").startswith(envelope_prefix)]
    inner = [e for e in evs
             if not e.get("name", "").startswith(envelope_prefix)]
    env_span = sum(e["dur"] for e in envs)
    covered = 0.0
    for env in envs:
        s, t = env["ts"], env["ts"] + env["dur"]
        for e in inner:
            es, et = e["ts"], e["ts"] + e["dur"]
            lo, hi = max(s, es), min(t, et)
            if hi > lo:
                covered += hi - lo
    return {
        "programs": len(envs),
        "program_ms": round(env_span / 1000.0, 3),
        "op_ms": round(covered / 1000.0, 3),
        "gap_ms": round((env_span - covered) / 1000.0, 3),
    }
