#!/usr/bin/env python
"""Generate committed capture-style IQ fixtures in the reference layout.

The reference's regression target is a corpus of *captured* signals laid
out as ``<device>/gNNN_<freq>M_<rate>k.cu8`` with expected JSON alongside
(ref .ci/scripts/do_tests.sh:14-22, github.com/merbanan/rtl_433_tests).
This environment has no network, so true captures are unobtainable; the
next-best regression asset is a frozen set of impaired synthesized
captures — SNR-degraded, clock-offset, edge-jittered — whose *expected
JSON is produced by the reference binary itself* and committed. The
fixtures are deliberately not regenerated at test time: the bytes in git
are the contract, so any pipeline regression (DSP, detector, slicer,
decoder, output formatting) shows up as a diff against a fixed input.

Usage: python tools/make_fixtures.py   (requires /tmp/rtlbuild/src/rtl_433)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

BIN = "/tmp/rtlbuild/src/rtl_433"
OUT = os.path.join(REPO, "tests", "fixtures")

# (dirname, protocol num, impairment profile) — modulation-diverse panel;
# g-numbers are arbitrary but stable, mirroring the corpus naming.
PANEL = [
    ("nexus",              19, dict(amp=48, noise=4.0, time_scale=1.003,
                                    jitter=0.012, seed_extra=101)),
    ("silvercrest",         1, dict(amp=64, noise=3.0, time_scale=0.997,
                                    jitter=0.02, seed_extra=102)),
    ("oregon_scientific",  12, dict(amp=56, noise=3.5, jitter=0.01,
                                    seed_extra=103)),
    ("acurite_txr",        40, dict(amp=44, noise=4.5, time_scale=1.005,
                                    seed_extra=104)),
    ("hideki_ts04",        42, dict(amp=60, noise=3.0, jitter=0.015,
                                    seed_extra=105)),
    ("oregon_v1",          50, dict(amp=52, noise=4.0, time_scale=0.995,
                                    seed_extra=106)),
    ("lacrosse_tx141x",    73, dict(amp=48, noise=4.0, jitter=0.018,
                                    seed_extra=107)),
    ("lacrosse_tx29",      76, dict(amp=64, noise=3.0, time_scale=1.002,
                                    seed_extra=108)),
    ("tpms_toyota",        88, dict(amp=72, noise=3.0, jitter=0.008,
                                    seed_extra=109)),
    ("x10_sec",            99, dict(amp=40, noise=5.0, time_scale=0.998,
                                    jitter=0.02, seed_extra=110)),
    ("efergy_optical",     63, dict(amp=64, noise=3.0, seed_extra=111)),
    ("fineoffset_wh1050",  69, dict(amp=48, noise=4.0, time_scale=1.004,
                                    jitter=0.01, seed_extra=112)),
    # round-3 corpus-tail families (gentle impairments: these frames are
    # length- or clock-critical by design)
    ("vaillant_vrt340f",   77, dict(amp=60, noise=3.0, jitter=0.01,
                                    seed_extra=113)),
    ("fordremote",         93, dict(amp=64, noise=2.5, seed_extra=114)),
    ("marlec_solar",      188, dict(amp=64, noise=3.0, jitter=0.006,
                                    seed_extra=115)),
    ("ced7000",           233, dict(amp=56, noise=3.5, seed_extra=116)),
    ("esa_energy",        117, dict(amp=56, noise=3.5, jitter=0.008,
                                    seed_extra=117)),
    ("watts_wfht_rf",     348, dict(amp=64, noise=3.0, time_scale=0.95,
                                    seed_extra=118)),
    ("rainpoint",         276, dict(amp=64, noise=3.0, seed_extra=119)),
    ("emontx",             45, dict(amp=60, noise=3.0, jitter=0.008,
                                    seed_extra=120)),
]


def main():
    from test_corpus_parity import build_corpus_entry, _ref_events
    from test_decoder_oracle import VECTORS

    vec = {}
    for num, code, min_events in VECTORS:
        if min_events > 0 and num not in vec:
            vec[num] = code

    os.makedirs(OUT, exist_ok=True)
    total = 0
    for gi, (name, num, kw) in enumerate(PANEL, start=1):
        code = vec.get(num)
        if code is None:
            print(f"skip {name}: no oracle vector")
            continue
        ddir = os.path.join(OUT, name)
        os.makedirs(ddir, exist_ok=True)
        import glob as _glob
        if _glob.glob(os.path.join(ddir, "*.cu8")):
            print(f"keep {name}: fixture already frozen")
            continue
        tmp = build_corpus_entry(num, code, ddir, **kw)
        if tmp is None:
            print(f"skip {name}: modulation not invertible")
            continue
        # reference layout name; sample rate is embedded so the loader
        # parses it from the filename exactly like the reference does
        import re
        base = os.path.basename(tmp)
        m = re.search(r"_(\d+)k\.cu8$", base)
        rate_k = int(m.group(1)) if m else 250
        fname = f"g{gi:03d}_433.92M_{rate_k}k.cu8"
        path = os.path.join(ddir, fname)
        os.replace(tmp, path)
        ref = _ref_events(num, path)
        if not ref:
            print(f"WARN {name}: reference decodes 0 events — dropping")
            os.remove(path)
            continue
        with open(os.path.join(ddir, fname.replace(".cu8", ".json")),
                  "w") as f:
            for ev in ref:
                f.write(json.dumps(ev, sort_keys=True) + "\n")
        with open(os.path.join(ddir, "protocol"), "w") as f:
            f.write(str(num) + "\n")
        sz = os.path.getsize(path)
        total += sz
        print(f"{name}: {fname} {sz//1024} KiB, {len(ref)} events")
    print(f"total fixture bytes: {total//1024} KiB")


if __name__ == "__main__":
    main()
