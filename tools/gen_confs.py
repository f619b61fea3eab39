#!/usr/bin/env python
"""Regenerate conf/ device examples from the reference's conf/ directory.

Each stock rtl_433 conf example is parsed with our getconf-compatible
tokenizer (rtl_433_tpu/confparse.py) and re-serialized as functional
entries only — timings, protocol selections and flex specs are device
facts (the parity contract); the prose comments are written fresh.

Run from the repo root:  python tools/gen_confs.py
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtl_433_tpu.confparse import parse_conf_entries  # noqa: E402

REF = "/root/reference/conf"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "conf")
SKIP = {"rtl_433.example.conf"}  # our example conf is hand-written


def pretty_decoder(val):
    """Emit a flex spec as a readable multi-line brace block."""
    fields = [f.strip() for f in val.split(",") if f.strip()]
    if fields[-1].endswith("}"):
        # a bit-width brace (e.g. get=...:{8}) on the last field would read
        # as the block's end-quote — emit the spec single-line instead
        return "decoder " + ",".join(fields)
    body = "".join(f"    {f},\n" for f in fields[:-1])
    body += f"    {fields[-1]}\n"
    return "decoder {\n" + body + "}"


def main():
    count = 0
    for path in sorted(glob.glob(os.path.join(REF, "*.conf"))):
        name = os.path.basename(path)
        if name in SKIP:
            continue
        entries = parse_conf_entries(open(path).read())
        title = name[:-5].replace("_", " ").replace("-", " ")
        lines = [
            f"# {title} — stock device example for tpu_433",
            "#",
            f"# Functional settings carried over from rtl_433's conf/{name}",
            "# (timings/protocol data are the device spec; see that file for",
            "# the author's notes).  Load with:",
            f"#   tpu_433 -c conf/{name}",
            "",
        ]
        for kw, val in entries:
            if kw == "decoder" and "," in val:
                lines.append(pretty_decoder(val))
            elif val:
                lines.append(f"{kw} {val}")
            else:
                lines.append(kw)
        with open(os.path.join(OUT, name), "w") as f:
            f.write("\n".join(lines) + "\n")
        count += 1
    print(f"wrote {count} conf files to {OUT}")


if __name__ == "__main__":
    main()
