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

# auto-panel impairment profiles, cycled deterministically per protocol:
# clean-ish, noisy, clock-fast, clock-slow, jittered, noisy+jittered
_PROFILES = [
    dict(amp=72, noise=2.5),
    dict(amp=44, noise=5.0),
    dict(amp=64, noise=3.0, time_scale=1.004),
    dict(amp=64, noise=3.0, time_scale=0.996),
    dict(amp=56, noise=3.5, jitter=0.012),
    dict(amp=48, noise=4.5, jitter=0.008, time_scale=1.002),
]

# target frozen corpus breadth (VERDICT r3 item 6: >= 100 protocol dirs)
TARGET = 108

# interleaved multi-protocol streams: several transmitters sharing one
# band/capture, the reference corpus' hardest replay shape (components
# must share a sample rate; all synthesized at 250k). Directory names
# must avoid fileformat tokens — "ook"/"am"/"fm"/"cu8"... anywhere in the
# path changes how the reference parses the file (src/fileformat.c scans
# every path segment), e.g. a "..._ook_..." dir made it read cu8 bytes as
# OOK pulse text and decode nothing.
MIXED = [
    ("interleaved_band433", [19, 1, 40, 12]),        # PPM+PWM+MC mix
    ("interleaved_fsk433", [26, 36, 63]),            # FSK PCM/PWM mix
    ("interleaved_dual_mod", [19, 44, 50]),          # ASK + FSK interleave
]


def _freeze(ddir, nums, iq_path, gi):
    """Reference-decode a frozen cu8 and write expected JSON + protocol."""
    from test_corpus_parity import _ref_events
    ref = _ref_events(nums, iq_path)
    if not ref:
        return None
    with open(iq_path.replace(".cu8", ".json"), "w") as f:
        for ev in ref:
            f.write(json.dumps(ev, sort_keys=True) + "\n")
    with open(os.path.join(ddir, "protocol"), "w") as f:
        f.write(" ".join(str(n) for n in nums) + "\n")
    return ref


def _build_one(name, num, kw, gi, vec):
    """Build + freeze one single-protocol fixture dir; returns bytes."""
    from test_corpus_parity import build_corpus_entry
    import glob as _glob
    import re
    code = vec.get(num)
    if code is None:
        print(f"skip {name}: no oracle vector")
        return 0
    ddir = os.path.join(OUT, name)
    os.makedirs(ddir, exist_ok=True)
    if _glob.glob(os.path.join(ddir, "*.cu8")):
        print(f"keep {name}: fixture already frozen")
        return 0
    tmp = build_corpus_entry(num, code, ddir, **kw)
    if tmp is None:
        print(f"skip {name}: modulation not invertible")
        os.rmdir(ddir)
        return 0
    # reference layout name; sample rate is embedded so the loader
    # parses it from the filename exactly like the reference does
    base = os.path.basename(tmp)
    m = re.search(r"_(\d+)k\.cu8$", base)
    rate_k = int(m.group(1)) if m else 250
    fname = f"g{gi:03d}_433.92M_{rate_k}k.cu8"
    path = os.path.join(ddir, fname)
    os.replace(tmp, path)
    ref = _freeze(ddir, [num], path, gi)
    if not ref:
        print(f"WARN {name}: reference decodes 0 events — dropping")
        os.remove(path)
        return 0
    sz = os.path.getsize(path)
    print(f"{name}: {fname} {sz//1024} KiB, {len(ref)} events")
    return sz


def _auto_panel(vec, have_nums):
    """Round-robin protocols across modulation families until TARGET
    dirs exist: breadth-first over (modulation x slicer) families, then
    depth within each (VERDICT r3 item 6)."""
    from rtl_433_tpu.decoders import Registry
    reg = Registry()
    by_mod = {}
    # int keys only: "num:arg" string vectors are parameterized decoders
    # whose registration needs the arg — not fixture-panel material
    for num in sorted(n for n in vec if isinstance(n, int)):
        if num in have_nums:
            continue
        dev = reg.get(num)
        if dev is None or not dev.modulation:
            continue
        by_mod.setdefault(dev.modulation, []).append((num, dev.symbol))
    out = []
    need = TARGET - len(have_nums)
    k = 0
    while need > len(out) and any(by_mod.values()):
        for mod in sorted(by_mod):
            if by_mod[mod] and len(out) < need:
                num, symbol = by_mod[mod].pop(0)
                prof = dict(_PROFILES[k % len(_PROFILES)],
                            seed_extra=200 + k)
                out.append((symbol, num, prof))
                k += 1
    return out


def _build_mixed(name, nums, gi, vec):
    """Concatenate several protocols' impaired captures into one stream
    with silence between transmissions; freeze the combined decode."""
    from test_corpus_parity import build_corpus_entry
    import glob as _glob
    import numpy as np
    ddir = os.path.join(OUT, name)
    os.makedirs(ddir, exist_ok=True)
    if _glob.glob(os.path.join(ddir, "*.cu8")):
        print(f"keep {name}: fixture already frozen")
        return 0
    rng = np.random.default_rng(1000 + gi)
    parts = []
    for j, num in enumerate(nums):
        code = vec.get(num)
        if code is None:
            continue
        prof = dict(_PROFILES[j % len(_PROFILES)], seed_extra=300 + gi + j)
        tmp = build_corpus_entry(num, code, ddir, **prof)
        if tmp is None:
            continue
        if "_250k" not in os.path.basename(tmp):
            os.remove(tmp)  # mixed streams share one 250k band
            continue
        parts.append(np.fromfile(tmp, np.uint8))
        os.remove(tmp)
    if len(parts) < 2:
        print(f"skip {name}: fewer than 2 combinable components")
        os.rmdir(ddir)
        return 0
    gap = lambda n: rng.integers(126, 131, size=n * 2, dtype=np.uint8)
    stream = [gap(8192)]
    for p in parts:
        stream += [p, gap(16384)]
    iq = np.concatenate(stream)
    fname = f"g{gi:03d}_433.92M_250k.cu8"
    path = os.path.join(ddir, fname)
    iq.tofile(path)
    ref = _freeze(ddir, nums, path, gi)
    if not ref:
        print(f"WARN {name}: reference decodes 0 events — dropping")
        os.remove(path)
        return 0
    sz = os.path.getsize(path)
    print(f"{name}: {fname} {sz//1024} KiB, {len(ref)} events "
          f"({len(parts)} transmissions)")
    return sz


def main():
    from test_decoder_oracle import VECTORS

    vec = {}
    for num, code, min_events in VECTORS:
        if min_events > 0 and num not in vec:
            vec[num] = code

    os.makedirs(OUT, exist_ok=True)
    total = 0
    panel = list(PANEL)
    panel += _auto_panel(vec, {num for _, num, _ in panel})
    for gi, (name, num, kw) in enumerate(panel, start=1):
        total += _build_one(name, num, kw, gi, vec)
    for gj, (name, nums) in enumerate(MIXED, start=len(panel) + 1):
        total += _build_mixed(name, nums, gj, vec)
    n_dirs = sum(1 for d in os.listdir(OUT)
                 if os.path.isdir(os.path.join(OUT, d)))
    print(f"total new fixture bytes: {total//1024} KiB; dirs: {n_dirs}")


if __name__ == "__main__":
    main()
