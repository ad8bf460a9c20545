"""Minimal XSpace/XPlane profile reader (no tensorflow needed).

`jax.profiler.trace` writes `*.xplane.pb` — an `XSpace` protobuf
(tsl/profiler/protobuf/xplane.proto). The in-image tensorboard profile
plugin cannot parse it (its converter needs a full tensorflow build), so
this module decodes the wire format directly with a ~100-line reader and
aggregates per-op device time — enough for the op-level summaries in
docs/PERF.md and `scripts/profile_train_step.py`.

Wire schema subset (field numbers from the public xplane.proto):
  XSpace.planes = 1                    XPlane.name = 2
  XPlane.lines = 3                     XPlane.event_metadata = 4 (map)
  XLine.name = 2, .events = 4          XEvent.metadata_id = 1
  XEvent.duration_ps = 3               XEventMetadata.id = 1, .name = 2
Only lengths/varints we consume are decoded; everything else is skipped.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from dataclasses import dataclass, field


def _read_varint(buf: memoryview, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message buffer.
    value is int for varint/fixed, memoryview for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:  # fixed64
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


@dataclass
class LineSummary:
    name: str
    total_ps: int = 0
    by_op: dict = field(default_factory=lambda: defaultdict(int))
    events: int = 0


@dataclass
class PlaneSummary:
    name: str
    lines: list = field(default_factory=list)  # [LineSummary]

    @property
    def total_ps(self) -> int:
        return sum(ln.total_ps for ln in self.lines)

    @property
    def events(self) -> int:
        return sum(ln.events for ln in self.lines)


def parse_xplane(path: str) -> list[PlaneSummary]:
    """Aggregate one .xplane.pb: per plane and per LINE, total event
    duration and a duration-by-event-name dict. Lines matter: a TPU device
    plane carries an 'XLA Ops' line (HLO ops), a 'Steps' line (events named
    by step number), and module-level trace-me lines — summing across them
    double-counts. Durations are summed busy-time, not a critical path."""
    with open(path, "rb") as f:
        space = memoryview(f.read())
    planes = []
    for fnum, _wt, v in _fields(space):
        if fnum != 1:
            continue
        meta: dict[int, str] = {}
        raw_lines = []
        pname = ""
        for pf, _pw, pv in _fields(v):
            if pf == 2:
                pname = bytes(pv).decode("utf-8", "replace")
            elif pf == 3:
                raw_lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, mname = None, ""
                for mf, _mw, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:
                        for ef, _ew, ev in _fields(mv):
                            if ef == 1:
                                mid = ev if mid is None else mid
                            elif ef == 2:
                                mname = bytes(ev).decode("utf-8", "replace")
                if mid is not None:
                    meta[mid] = mname
        ps = PlaneSummary(name=pname)
        for line in raw_lines:
            ls = LineSummary(name="")
            for lf, _lw, lv in _fields(line):
                if lf == 2:
                    ls.name = bytes(lv).decode("utf-8", "replace")
                elif lf == 11 and not ls.name:  # display_name fallback
                    ls.name = bytes(lv).decode("utf-8", "replace")
                elif lf == 4:
                    mid, dur = 0, 0
                    for ef, _ew, ev in _fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 3:
                            dur = ev
                    ls.total_ps += dur
                    ls.events += 1
                    ls.by_op[meta.get(mid, f"#{mid}")] += dur
            ps.lines.append(ls)
        planes.append(ps)
    return planes


def device_summary(
    trace_dir: str, top_k: int = 15
) -> dict:
    """Find the newest xplane.pb under a jax.profiler trace dir and return
    {plane, total_ms, events, top: [(op, ms, frac)], groups: {...}} for the
    device plane (falls back to the busiest plane)."""
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    planes = parse_xplane(paths[-1])
    dev = [p for p in planes if "TPU" in p.name or "device" in p.name.lower()]
    cand = dev or planes
    plane = max(cand, key=lambda p: p.total_ps)
    # the HLO-op line only: 'Steps' (step-number events) and module-level
    # trace-me lines on the same plane would double-count everything
    op_lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
    line = (
        op_lines[0]
        if op_lines
        else max(plane.lines, key=lambda ln: ln.events, default=LineSummary(""))
    )
    # control-flow wrapper events (%while/%conditional/%call — the remat
    # scan bodies) CONTAIN their body ops, which are separately evented on
    # the same line: keep leaves only, or every total double-counts
    leaf = {
        op: ps
        for op, ps in line.by_op.items()
        if not op.startswith(("%while", "%conditional", "%call"))
    }
    total = sum(leaf.values()) or 1
    ranked = sorted(leaf.items(), key=lambda kv: -kv[1])
    top = [
        (op, round(ps / 1e9, 3), round(ps / total, 4))
        for op, ps in ranked[:top_k]
    ]

    # non-overlapping buckets, first match wins (fusion names only hint at
    # contents — XLA:TPU timelines are almost entirely fusions)
    buckets = [
        ("collectives", lambda o: any(k in o for k in (
            "all-reduce", "all-gather", "reduce-scatter", "collective",
            "permute"))),
        ("matmul_conv", lambda o: any(k in o for k in (
            "dot", "conv", "einsum"))),
        ("custom_call_pallas", lambda o: "custom-call" in o or "flash" in o),
        ("data_movement", lambda o: any(k in o for k in (
            "copy", "transpose", "reshape", "bitcast", "dynamic-update",
            "dynamic_update", "dynamic-slice", "dynamic_slice"))),
        ("reductions", lambda o: "reduce" in o),
        ("fusion_other", lambda o: "fusion" in o),
    ]

    import re

    def bucket_of(op: str) -> str:
        # classify on the op NAME plus the HLO op KIND (the token before
        # the operand list, e.g. "%attn1.111 = bf16[...] custom-call(...)"
        # → kind custom-call). Using the FULL event string would misfile
        # nearly everything: operand text mentions other ops' names.
        name, _, rhs = op.partition(" = ")
        kind = ""
        m = re.search(r"([a-z][a-z0-9\-_.]*)\(", rhs)
        if m:
            kind = m.group(1)
        o = f"{name} {kind}".lower()
        for bname, pred in buckets:
            if pred(o):
                return bname
        return "other"

    groups = {name: 0.0 for name, _ in buckets}
    groups["other"] = 0.0
    for op, ps in leaf.items():
        groups[bucket_of(op)] += ps / total
    groups = {k: round(v, 4) for k, v in groups.items()}
    return {
        "xplane": paths[-1],
        "plane": plane.name,
        "line": line.name,
        "total_busy_ms": round(total / 1e9, 3),
        "events": line.events,
        "top": top,
        "groups": groups,
        "all_planes": [p.name for p in planes],
        "plane_lines": [
            (ln.name, round(ln.total_ps / 1e9, 1), ln.events)
            for ln in plane.lines
        ],
    }
