"""Extract the protocol registry table from the reference sources.

Reads the DEVICES X-macro order (ref include/rtl_433_devices.h:10-...) and
each r_device struct initializer in src/devices/*.c, producing
rtl_433_tpu/decoders/registry_data.json: per protocol number the name,
modulation, timing parameters, priority/disabled flags and CSV field list.

This is data extraction (timing constants and names are facts about the
protocols, not code); all decode logic is implemented fresh in
rtl_433_tpu/decoders/.
"""

import json
import os
import re
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "rtl_433_tpu", "decoders", "registry_data.json")

# 1. registry order
devices_h = open(os.path.join(REF, "include", "rtl_433_devices.h")).read()
macro = re.search(r"#define DEVICES(.*?)\n\n", devices_h, re.S).group(1)
order = re.findall(r"DECL\((\w+)\)", macro)
print(f"{len(order)} registry slots")

# 2. parse every r_device definition in src/devices/*.c
# fields arrays are often file-local `static ... output_fields[]`, so keep
# the lookup per-file.
defs = {}
src_dir = os.path.join(REF, "src", "devices")
for fn in sorted(os.listdir(src_dir)):
    if not fn.endswith(".c"):
        continue
    text = open(os.path.join(src_dir, fn), encoding="utf-8", errors="replace").read()
    fields_lists = {}
    for m in re.finditer(
            r"char\s+const\s*\*\s*const\s+(\w+)\[\]\s*=\s*\{(.*?)\};", text, re.S):
        fields_lists[m.group(1)] = re.findall(r'"([^"]*)"', m.group(2))
    for m in re.finditer(
            r"r_device\s+(?:const\s+)?(\w+)\s*=\s*\{(.*?)\};", text, re.S):
        name, body = m.group(1), m.group(2)
        entry = {"file": fn, "_fields_lists": fields_lists}
        nm = re.search(r'\.name\s*=\s*"((?:[^"\\]|\\.)*)"', body)
        if nm:
            entry["name"] = '"' + nm.group(1) + '"'
        for fm in re.finditer(r"\.(\w+)\s*=\s*([^,}\"]+)", body):
            key, val = fm.group(1), fm.group(2).strip()
            if key == "name":
                continue
            val = re.sub(r"//.*", "", val).strip()
            entry[key] = val
        defs[name] = entry

print(f"{len(defs)} r_device definitions parsed")


def num(v, default=0.0):
    if v is None:
        return default
    # strip C float suffixes anywhere in the expression, not just trailing
    # (e.g. `2000000.0f / (49230 + 49261)` — emontx.c:163)
    v = re.sub(r"(?<=[0-9.])[fF]\b", "", v.strip())
    try:
        import numpy as np
        # r_device timing fields are C `float`: round through float32 so
        # downstream samples_per_us math matches the reference bit-exactly
        return float(np.float32(eval(v, {"__builtins__": {}}, {})))
    except Exception:
        return default


registry = []
missing = []
for i, sym in enumerate(order, start=1):
    d = defs.get(sym)
    if d is None or sym == "new_template":
        registry.append({"num": i, "symbol": sym, "placeholder": True})
        continue
    name = (d.get("name") or '""').strip().strip('"')
    fields_sym = d.get("fields", "").strip().lstrip("&")
    fields_lists = d.get("_fields_lists", {})
    entry = {
        "num": i,
        "symbol": sym,
        "name": name,
        "modulation": d.get("modulation", "").strip(),
        "short_width": num(d.get("short_width")),
        "long_width": num(d.get("long_width")),
        "sync_width": num(d.get("sync_width")),
        "gap_limit": num(d.get("gap_limit")),
        "reset_limit": num(d.get("reset_limit")),
        "tolerance": num(d.get("tolerance")),
        "priority": int(num(d.get("priority"))),
        "disabled": int(num(d.get("disabled"))),
        "file": d.get("file"),
        "fields": fields_lists.get(fields_sym, []),
        "has_create_fn": "create_fn" in d,
    }
    registry.append(entry)

print(f"{sum(1 for r in registry if not r.get('placeholder'))} protocols, "
      f"{len(missing)} missing")
os.makedirs(os.path.dirname(OUT), exist_ok=True)
json.dump(registry, open(OUT, "w"), indent=0)
print("wrote", OUT)
