"""Output sinks: console/file JSON, KV, CSV (network sinks in later layers).

Mirrors the reference sink behaviors (ref src/output_file.c: JSON :157,
KV :457, CSV :707 with field negotiation via determine_csv_fields,
src/r_api.c:414-436).
"""

from __future__ import annotations

import sys
from typing import IO, List, Optional

from .data_model import Event, event_to_json, event_to_jsons, event_to_kv


class JsonSink:
    """-F json: one JSON object per line (ref src/output_file.c:157)."""

    def __init__(self, file: Optional[IO] = None, compact: bool = False):
        self.file = file or sys.stdout
        self.compact = compact

    def __call__(self, ev: Event):
        s = event_to_jsons(ev) if self.compact else event_to_json(ev)
        print(s, file=self.file, flush=True)


class KvSink:
    """-F kv: human-readable key/value lines (ref src/output_file.c:457)."""

    def __init__(self, file: Optional[IO] = None):
        self.file = file or sys.stdout

    def __call__(self, ev: Event):
        print(event_to_kv(ev, color=getattr(self.file, 'isatty', lambda: False)()), file=self.file)
        print("", file=self.file, flush=True)


class CsvSink:
    """-F csv with upfront field negotiation (ref src/output_file.c:707)."""

    def __init__(self, fields: List[str], file: Optional[IO] = None):
        self.fields = list(fields)
        self.file = file or sys.stdout
        self._wrote_header = False

    def _header(self):
        print(",".join(self.fields), file=self.file)
        self._wrote_header = True

    def __call__(self, ev: Event):
        if not self._wrote_header:
            self._header()
        d = ev.to_dict()
        row = []
        for k in self.fields:
            v = d.get(k, "")
            s = str(v)
            if "," in s or '"' in s:
                s = '"' + s.replace('"', '""') + '"'
            row.append(s)
        print(",".join(row), file=self.file, flush=True)


def well_known_fields(extra_meta: bool = False) -> List[str]:
    """ref src/r_api.c:341-378."""
    out = ["time", "msg", "codes"]
    if extra_meta:
        out += ["protocol", "description", "mod", "freq", "freq1", "freq2",
                "rssi", "snr", "noise"]
    return out


def determine_csv_fields(devices, extra=()) -> List[str]:
    """Collect CSV fields from registered decoders (ref src/r_api.c:414-436)."""
    seen = []
    for f in well_known_fields(True):
        if f not in seen:
            seen.append(f)
    for dev in devices:
        for f in dev.fields:
            if f not in seen:
                seen.append(f)
    for f in extra:
        if f not in seen:
            seen.append(f)
    return seen
