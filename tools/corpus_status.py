#!/usr/bin/env python
"""Corpus synth status: which protocols' synthesized IQ does the REFERENCE
binary fail to decode (the NODECODE tail of tests/test_corpus_parity.py)?

NODECODE means the inverse-modulator/synth chain doesn't reproduce a
decodable signal — a synthesis gap, not a decode gap (our side matches the
reference bit-for-bit either way). Prints per-protocol modulation/timing
info grouped by modulation so the gaps can be attacked family-by-family.

Run: JAX_PLATFORMS=cpu python tools/corpus_status.py [--limit N]
"""

import json
import os
import subprocess
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

BIN = "/tmp/rtlbuild/src/rtl_433"


def main():
    from test_corpus_parity import build_corpus_entry
    from test_decoder_oracle import VECTORS
    from rtl_433_tpu.decoders import Registry

    reg = Registry()
    tmpdir = tempfile.mkdtemp(prefix="corpus_status_")
    seen = set()
    nodecode = []
    unsup = []
    npass = 0
    for num, code, min_events in VECTORS:
        if isinstance(num, str) or num in seen or min_events == 0:
            continue
        seen.add(num)
        path = build_corpus_entry(num, code, tmpdir)
        dev = reg.get(num)
        if path is None:
            unsup.append((num, dev.symbol, dev.modulation))
            continue
        out = subprocess.run([BIN, "-R", str(num), "-r", path, "-F", "json"],
                             capture_output=True, text=True, timeout=60)
        evs = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if evs:
            npass += 1
        else:
            nodecode.append(num)

    print(f"ref-decodes: {npass}, NODECODE: {len(nodecode)}, "
          f"unsupported-modulation: {len(unsup)}")
    by_mod = defaultdict(list)
    for num in nodecode:
        dev = reg.get(num)
        by_mod[dev.modulation].append(
            (num, dev.symbol, dev.short_width, dev.long_width,
             dev.gap_limit, dev.reset_limit, dev.sync_width, dev.tolerance))
    for mod in sorted(by_mod):
        print(f"\n== {mod} ({len(by_mod[mod])}):")
        for t in by_mod[mod]:
            print(f"  #{t[0]:<3} {t[1]:<28} s={t[2]} l={t[3]} g={t[4]} "
                  f"r={t[5]} sync={t[6]} tol={t[7]}")
    for num, sym, mod in unsup:
        print(f"UNSUP #{num} {sym} {mod}")


if __name__ == "__main__":
    main()
