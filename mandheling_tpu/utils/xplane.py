"""Minimal XPlane (jax.profiler trace) reader + per-op aggregation.

The reference dumps a per-OpType time+flops table each epoch
(`express/Executor.cpp:34-77` Executor::Profiler, enabled by
MNN_EXPR_ENABLE_PROFILER and printed by `demo/MnistUtils.cpp:72,184`).
The TPU analog: capture a jax.profiler trace (XSpace protobuf) of the
jitted step and aggregate the device-side XLA op events by HLO
category / op name.

The tensorboard_plugin_profile converters bundled in this image ship
protobuf-5-era generated code that protobuf 6 refuses to load, so this
module reads the XSpace wire format directly (proto wire layout of
tensorflow/core/profiler/protobuf/xplane.proto — a stable public schema).
Hand-rolled field-tag parsing, same approach as utils/flatbuf.py and
utils/onnx_io.py take for their formats.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple

# ---------------------------------------------------------------- wire layer


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for a serialized message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _zigzag64_to_signed(v: int) -> int:
    # xplane int64 fields are plain varints (two's complement), not zigzag
    return v - (1 << 64) if v >= (1 << 63) else v


# ------------------------------------------------------------- schema layer


class XStat:
    __slots__ = ("metadata_id", "value")

    def __init__(self, buf: bytes):
        self.metadata_id = 0
        self.value: object = None
        for f, wt, v in _fields(buf):
            if f == 1:
                self.metadata_id = v
            elif f == 2:  # double
                import struct

                self.value = struct.unpack("<d", v.to_bytes(8, "little"))[0]
            elif f in (3, 7):  # uint64 / ref
                self.value = v
            elif f == 4:  # int64
                self.value = _zigzag64_to_signed(v)
            elif f == 5:  # string
                self.value = v.decode("utf-8", "replace")
            elif f == 6:  # bytes
                self.value = v


class XEvent:
    __slots__ = ("metadata_id", "offset_ps", "duration_ps", "num_occurrences", "stats")

    def __init__(self, buf: bytes):
        self.metadata_id = 0
        self.offset_ps = 0
        self.duration_ps = 0
        self.num_occurrences = 1
        self.stats: List[XStat] = []
        for f, wt, v in _fields(buf):
            if f == 1:
                self.metadata_id = v
            elif f == 2:
                self.offset_ps = _zigzag64_to_signed(v)
            elif f == 3:
                self.duration_ps = _zigzag64_to_signed(v)
            elif f == 5:
                self.num_occurrences = v
            elif f == 4:
                self.stats.append(XStat(v))


class XLine:
    __slots__ = ("name", "display_name", "events")

    def __init__(self, buf: bytes):
        self.name = ""
        self.display_name = ""
        self.events: List[XEvent] = []
        for f, wt, v in _fields(buf):
            if f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 11:
                self.display_name = v.decode("utf-8", "replace")
            elif f == 4:
                self.events.append(XEvent(v))


class XEventMetadata:
    __slots__ = ("id", "name", "display_name", "stats")

    def __init__(self, buf: bytes):
        self.id = 0
        self.name = ""
        self.display_name = ""
        self.stats: List[XStat] = []
        for f, wt, v in _fields(buf):
            if f == 1:
                self.id = v
            elif f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 4:
                self.display_name = v.decode("utf-8", "replace")
            elif f == 5:
                self.stats.append(XStat(v))


def _parse_map_entry(buf: bytes) -> Tuple[int, bytes]:
    key, val = 0, b""
    for f, wt, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            val = v
    return key, val


class XPlane:
    __slots__ = ("name", "lines", "event_metadata", "stat_metadata")

    def __init__(self, buf: bytes):
        self.name = ""
        self.lines: List[XLine] = []
        self.event_metadata: Dict[int, XEventMetadata] = {}
        self.stat_metadata: Dict[int, str] = {}
        for f, wt, v in _fields(buf):
            if f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.lines.append(XLine(v))
            elif f == 4:
                k, ev = _parse_map_entry(v)
                self.event_metadata[k] = XEventMetadata(ev)
            elif f == 5:
                k, sv = _parse_map_entry(v)
                # XStatMetadata: field 2 = name
                name = ""
                for f2, _, v2 in _fields(sv):
                    if f2 == 2:
                        name = v2.decode("utf-8", "replace")
                self.stat_metadata[k] = name


def parse_xspace(path: str) -> List[XPlane]:
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for f_, wt, v in _fields(buf):
        if f_ == 1:
            planes.append(XPlane(v))
    return planes


# --------------------------------------------------------- aggregation layer


def find_xplane_files(logdir: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )


def device_planes(planes: List[XPlane]) -> List[XPlane]:
    """Accelerator (or CPU-device) planes holding XLA op events."""
    dev = [
        p
        for p in planes
        if p.name.startswith("/device:")
        and not p.name.startswith("/device:CPU")  # host plane = python events
    ]
    if dev:
        return dev
    # CPU-only runs: XLA ops land on the TFStreamz-less host plane lines
    return [p for p in planes if p.name.startswith("/device:")]


def per_op_rows(
    planes: List[XPlane], line_filter: str = "XLA Ops"
) -> List[dict]:
    """Aggregate device 'XLA Ops' line events by op metadata.

    Returns one row per distinct op name:
      {name, category, occurrences, total_us, flops, bytes_accessed}
    flops/bytes come from the event-metadata stats when the profiler
    recorded them (TPU does; CPU traces usually omit them).
    """
    agg: Dict[str, dict] = {}
    for plane in planes:
        stat_names = plane.stat_metadata
        for line in plane.lines:
            lname = line.display_name or line.name
            if line_filter and line_filter.lower() not in lname.lower():
                continue
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                name = (md.display_name or md.name) if md else f"op{ev.metadata_id}"
                row = agg.setdefault(
                    name,
                    {
                        "name": name,
                        "category": "",
                        "occurrences": 0,
                        "total_us": 0.0,
                        "flops": 0,
                        "bytes_accessed": 0,
                    },
                )
                row["occurrences"] += 1
                row["total_us"] += ev.duration_ps / 1e6
                if md and not row["category"]:
                    for st in md.stats:
                        sname = stat_names.get(st.metadata_id, "")
                        if sname == "hlo_category":
                            row["category"] = st.value
                        elif sname == "flops":
                            row["flops"] = int(st.value or 0)
                        elif sname == "bytes_accessed":
                            row["bytes_accessed"] = int(st.value or 0)
                        elif sname in ("tf_op", "tf_op_name"):
                            row["source"] = st.value
                if "source" not in row or not row["source"]:
                    # async ops carry the originating-op stats per event
                    for st in ev.stats:
                        sname = stat_names.get(st.metadata_id, "")
                        if sname in ("tf_op", "tf_op_name"):
                            row["source"] = st.value
                        elif sname == "hlo_op" and not row.get("source"):
                            row["source"] = st.value
    return sorted(agg.values(), key=lambda r: -r["total_us"])


def by_category(rows: List[dict]) -> List[dict]:
    """Collapse per-op rows into per-HLO-category rows (the per-OpType view
    of the reference's Profiler::dump)."""
    agg: Dict[str, dict] = {}
    for r in rows:
        cat = r["category"] or "(uncategorized)"
        row = agg.setdefault(
            cat,
            {"category": cat, "ops": 0, "occurrences": 0, "total_us": 0.0,
             "flops": 0, "bytes_accessed": 0},
        )
        row["ops"] += 1
        row["occurrences"] += r["occurrences"]
        row["total_us"] += r["total_us"]
        row["flops"] += r["flops"] * r["occurrences"]
        row["bytes_accessed"] += r["bytes_accessed"] * r["occurrences"]
    return sorted(agg.values(), key=lambda r: -r["total_us"])


def format_table(rows: List[dict], top: Optional[int] = None) -> str:
    """Render rows like the reference's per-OpType dump
    (express/Executor.cpp:60-76: name, time, %, flops)."""
    total = sum(r["total_us"] for r in rows) or 1.0
    out = [f"{'op/category':48s} {'n':>6s} {'time_us':>12s} {'%':>6s} "
           f"{'GFLOP':>10s} {'GB':>8s}  source"]
    for r in rows[: top or len(rows)]:
        name = r.get("name") or r.get("category", "?")
        out.append(
            f"{name[:48]:48s} {r['occurrences']:6d} {r['total_us']:12.1f} "
            f"{100*r['total_us']/total:6.1f} "
            f"{r.get('flops', 0)/1e9:10.3f} "
            f"{r.get('bytes_accessed', 0)/1e9:8.3f}  "
            f"{r.get('source', '')[:60]}"
        )
    return "\n".join(out)


# -- overlap analysis (r4): measured analog of the reference's CPU/DSP
# co-scheduling evidence (CPUBackend.cpp:209-263 runs the weight-gradient
# DSP graph on a parallel thread while the CPU computes other ops). On TPU
# the same concurrency is XLA's async DMA queues overlapping the compute
# queue; this quantifies it from the trace instead of asserting it. --

_COPY_CATEGORIES = frozenset((
    "copy-start", "copy-done", "async-start", "async-done",
    "data formatting", "broadcast", "copy",
))

# control-flow shells span their children on the same timeline (the while
# row in the per-op table covers the whole loop) — exclude them from both
# classes or they'd intersect everything
_CONTROL_CATEGORIES = frozenset(("while", "conditional", "call", ""))


def _merge(intervals):
    """Union length of [start, end) ps intervals."""
    total = 0
    last_end = None
    for s, e in sorted(intervals):
        if last_end is None or s > last_end:
            total += e - s
            last_end = e
        elif e > last_end:
            total += e - last_end
            last_end = e
    return total


def _intersect_len(a, b):
    """Total overlap length between two interval lists (each first merged)."""
    def merged(iv):
        out = []
        for s, e in sorted(iv):
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    am, bm = merged(a), merged(b)
    i = j = 0
    total = 0
    while i < len(am) and j < len(bm):
        s = max(am[i][0], bm[j][0])
        e = min(am[i][1], bm[j][1])
        if s < e:
            total += e - s
        if am[i][1] < bm[j][1]:
            i += 1
        else:
            j += 1
    return total


def _in_ranges(src: str, ranges) -> bool:
    """True when a 'path:line' source stat falls inside any
    (path_substring, first_line, last_line) range."""
    if not src or ":" not in src:
        return False
    path, _, line_s = src.rpartition(":")
    try:
        line = int(line_s)
    except ValueError:
        return False
    return any(p in path and lo <= line <= hi for (p, lo, hi) in ranges)


def source_ranges_of(*funcs):
    """(file_substring, first_line, last_line) for each python function —
    build overlap_report fgrad_ranges from the actual op implementations
    so the trace attribution survives refactors."""
    import inspect
    import os

    out = []
    for f in funcs:
        lines, start = inspect.getsourcelines(f)
        path = os.path.abspath(inspect.getsourcefile(f))
        out.append((path, start, start + len(lines) - 1))
    return out


def overlap_report(
    planes: List[XPlane], line_filter: str = "XLA Ops",
    fgrad_marker: str = "", fgrad_ranges=(),
) -> dict:
    """Compute/copy concurrency from a device trace.

    Classifies every event on the XLA Ops line(s) as data movement
    (_COPY_CATEGORIES) or compute, merges each class's intervals, and
    reports union lengths + the copy-compute intersection. Filter-grad
    ops are identified by `fgrad_marker` (substring of op name/tf_op) or
    `fgrad_ranges` ((file_substr, lo, hi) ranges matched against the HLO
    `source` file:line stat — see source_ranges_of); their overlap with
    OTHER compute and with data movement is the reference's
    parallel-gradient-thread analog, measured.
    """
    copy_iv, compute_iv, fgrad_iv, other_compute_iv = [], [], [], []
    want_fgrad = bool(fgrad_marker or fgrad_ranges)
    for plane in planes:
        stat_names = plane.stat_metadata
        for line in plane.lines:
            lname = line.display_name or line.name
            if line_filter and line_filter.lower() not in lname.lower():
                continue
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                cat = ""
                src = ""
                file_src = ""
                if md:
                    for st in md.stats:
                        sname = stat_names.get(st.metadata_id, "")
                        if sname == "hlo_category":
                            cat = st.value
                        elif sname in ("tf_op", "tf_op_name"):
                            src = src or str(st.value)
                        elif sname == "source":
                            file_src = str(st.value)
                name = (md.display_name or md.name) if md else ""
                iv = (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                if cat in _CONTROL_CATEGORIES:
                    continue
                if cat in _COPY_CATEGORIES:
                    copy_iv.append(iv)
                else:
                    compute_iv.append(iv)
                    is_fgrad = want_fgrad and (
                        (fgrad_marker and (fgrad_marker in name
                                           or fgrad_marker in src))
                        or _in_ranges(file_src, fgrad_ranges)
                    )
                    if is_fgrad:
                        fgrad_iv.append(iv)
                    else:
                        other_compute_iv.append(iv)
    all_iv = copy_iv + compute_iv
    span = (max(e for _, e in all_iv) - min(s for s, _ in all_iv)
            if all_iv else 0)
    copy_u = _merge(copy_iv)
    comp_u = _merge(compute_iv)
    both = _intersect_len(copy_iv, compute_iv)
    out = {
        "span_us": span / 1e6,
        "busy_us": _merge(all_iv) / 1e6,
        "compute_union_us": comp_u / 1e6,
        "copy_union_us": copy_u / 1e6,
        "copy_compute_overlap_us": both / 1e6,
        "copy_hidden_frac": both / copy_u if copy_u else 0.0,
        "copy_exposed_us": (copy_u - both) / 1e6,
    }
    if want_fgrad:
        fg_u = _merge(fgrad_iv)
        out["fgrad_union_us"] = fg_u / 1e6
        out["fgrad_overlap_other_compute_us"] = (
            _intersect_len(fgrad_iv, other_compute_iv) / 1e6)
        out["fgrad_overlap_copy_us"] = _intersect_len(fgrad_iv, copy_iv) / 1e6
    return out
