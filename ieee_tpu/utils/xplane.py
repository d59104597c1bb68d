"""Minimal XSpace/XPlane protobuf reader for jax.profiler traces.

Observability subsystem (SURVEY §5: the reference's only tracing is
wall-clock meters; the TPU plan is jax-profiler traces). This parses the
``*.xplane.pb`` files jax.profiler writes WITHOUT tensorflow/tensorboard —
a hand-rolled varint walker over the stable xplane.proto schema — and
aggregates device op durations, giving an xprof-style per-op summary on any
machine.

Usage:
    from ieee_tpu.utils.xplane import op_summary
    with jax.profiler.trace("/tmp/trace"):
        step()
    for row in op_summary("/tmp/trace")[:20]:
        print(row)
"""

from __future__ import annotations

import glob
import os.path as osp
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

__all__ = ["parse_xspace", "op_summary"]


def _varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 1:  # 64-bit
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wire == 5:  # 32-bit
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def parse_xspace(path: str) -> List[Dict]:
    """Parse an xplane.pb into [{name, lines: [{name, events}],
    event_names: {id: name}}] keeping only what the summary needs."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 2:  # XPlane
            planes.append(_parse_plane(val))
    return planes


def _parse_plane(buf: bytes) -> Dict:
    plane = {"name": "", "lines": [], "event_names": {}}
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            plane["name"] = val.decode("utf-8", "replace")
        elif field == 3 and wire == 2:
            plane["lines"].append(_parse_line(val))
        elif field == 4 and wire == 2:  # map<int64, XEventMetadata>
            key, meta_name = None, ""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 2 and w3 == 2:
                            meta_name = v3.decode("utf-8", "replace")
            if key is not None:
                plane["event_names"][key] = meta_name
    return plane


def _parse_line(buf: bytes) -> Dict:
    line = {"name": "", "events": []}
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            line["name"] = val.decode("utf-8", "replace")
        elif field == 4 and wire == 2:  # XEvent
            ev = {"metadata_id": 0, "duration_ps": 0, "occurrences": 1}
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    ev["metadata_id"] = v2
                elif f2 == 3 and w2 == 0:
                    ev["duration_ps"] = v2
                elif f2 == 5 and w2 == 0:
                    ev["occurrences"] = v2
            line["events"].append(ev)
    return line


def op_summary(trace_dir: str, plane_filter: str = "TPU",
               line_filter: str = "XLA Ops") -> List[Dict]:
    """Aggregate device op durations from a jax.profiler trace directory.

    ``line_filter`` matches the line name EXACTLY: the default "XLA Ops" is
    real device-op occupancy, while "Async XLA Ops" (a different line) is
    overlapped DMA that would double-count wall time if substring-matched.

    Returns rows {name, total_ms, count, avg_us} sorted by total time.
    """
    paths = glob.glob(
        osp.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals = defaultdict(lambda: [0, 0])  # name -> [ps, count]
    for path in paths:
        for plane in parse_xspace(path):
            if plane_filter not in plane["name"]:
                continue
            names = plane["event_names"]
            for line in plane["lines"]:
                if line_filter and line["name"] != line_filter:
                    continue
                for ev in line["events"]:
                    name = names.get(ev["metadata_id"],
                                     f"id{ev['metadata_id']}")
                    totals[name][0] += ev["duration_ps"]
                    totals[name][1] += max(ev.get("occurrences", 1), 1)
    rows = [
        {
            "name": name,
            "total_ms": ps / 1e9,
            "count": cnt,
            "avg_us": ps / 1e6 / max(cnt, 1),
        }
        for name, (ps, cnt) in totals.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows
