"""IQ-level corpus parity: synthesize IQ per protocol, replay through BOTH
full pipelines (reference `rtl_433 -r` and our `RtlTpu.decode_file`), and
diff decoded JSON events field-for-field.

This is the rtl_433_tests-corpus analogue (ref .ci/scripts/do_tests.sh:14-22,
replay path src/rtl_433.c:1688-1866) built from the oracle bit vectors:
each vector's bitbuffer is inverse-sliced (tests/modulate.py) into a pulse
train at the protocol's registered timings and synthesized to CU8
(tests/synth.py). Unlike the `-y` oracle tests this exercises L0-L3 —
file loading, baseband DSP, OOK/FSK detection and slicing — end to end.

Prints the corpus parity count; the bar below is a floor, not the target —
grow it as more modulations gain inverse-slicer support.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from modulate import modulate
from synth import synth_ook, synth_fsk

BIN = "/tmp/rtlbuild/src/rtl_433"

MIN_PARITY_PROTOCOLS = 290


def _normalize(ev):
    ev = dict(ev)
    ev.pop("time", None)
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in ev.items()}


def _ref_events(num, path):
    out = subprocess.run([BIN, "-R", str(num), "-r", str(path), "-F", "json"],
                         capture_output=True, text=True, timeout=60)
    return [_normalize(json.loads(l)) for l in out.stdout.splitlines()
            if l.startswith("{")]


def _our_events(num, path):
    from rtl_433_tpu.api import RtlTpu
    from rtl_433_tpu.output.data_model import event_to_json
    rx = RtlTpu(register_all=False, report_time="off")
    rx.registry.register(num)
    evs = rx.decode_file(str(path))
    return [_normalize(json.loads(event_to_json(e))) for e in evs]


def build_corpus_entry(num, code, tmpdir, amp=100, noise=2.0,
                       time_scale=1.0, jitter=0.0, seed_extra=0):
    """Vector -> cu8 file, or None when the modulation is not invertible.

    Impairment knobs model real-capture warts for the noisy replay suite
    (tests/test_corpus_noisy.py): ``amp``/``noise`` set the SNR,
    ``time_scale`` applies a transmitter clock offset to every width, and
    ``jitter`` adds per-edge uniform timing error (fraction of the width).
    """
    import numpy as np
    from rtl_433_tpu.bits.bitbuffer import BitBuffer
    from rtl_433_tpu.decoders import Registry
    reg = Registry()
    dev = reg.get(num)
    if dev is None or "|" in code or code.upper().startswith("AAB"):
        return None
    bits = BitBuffer.parse(code)
    train = modulate(bits, dev)
    if train is None:
        return None
    if time_scale != 1.0 or jitter:
        rng = np.random.default_rng(1000 + num + seed_extra)
        train = [(p * time_scale * (1 + rng.uniform(-jitter, jitter)),
                  g * time_scale * (1 + rng.uniform(-jitter, jitter)))
                 for p, g in train]
    # short-bit protocols need the high-band rate for >=10-sample pulses
    rate = 250_000 if dev.short_width >= 60 else 1_024_000
    if dev.is_fsk:
        seq = []
        # the FSK tracker eats ~16 bit periods while locking (both
        # pipelines identically), which can push length-gated decoders
        # under their minimum (e.g. lacrosse_breezepro needs >=264 bits);
        # real transmitters front-load extra preamble — do the same for
        # PCM where a bit period is well-defined
        if dev.short_width == dev.long_width and dev.short_width > 0:
            for _ in range(10):
                seq.append((dev.short_width * time_scale, True))
                seq.append((dev.short_width * time_scale, False))
        for p, g in train[:-1]:
            seq.append((p, True))
            seq.append((g, False))
        # keep trailing space bits on-carrier (f2) before carrier-off —
        # the final modulator gap is data zeros + the reset end-gap
        end_gap = dev.reset_limit * 1.5 + 1000
        trailing = max(0.0, train[-1][1] - end_gap)
        seq.append((train[-1][0], True))
        if trailing > 0:
            seq.append((trailing, False))
        # scale the mark/space tones with the rate so the FM deviation stays
        # above the FSK tracker's delta (6000 int16-phase units): a fixed
        # 40 kHz separation is only ~2550 units at 1.024 MS/s
        iq = synth_fsk(seq, rate=rate, f1_hz=rate * 60_000 / 250_000,
                       f2_hz=rate * 20_000 / 250_000, amp=amp, noise=noise,
                       lead_in_us=16_000, tail_us=80_000,
                       seed=num + seed_extra)
    else:
        iq = synth_ook(train, rate=rate, amp=amp, noise=noise,
                       lead_in_us=16_000, tail_us=80_000,
                       seed=num + seed_extra)
    name = f"g{num:03d}_433.92M_{rate // 1000}k.cu8"
    path = os.path.join(tmpdir, name)
    iq.tofile(path)
    return path


@pytest.fixture(scope="session")
def rtl433():
    if not os.path.exists(BIN):
        pytest.skip("reference binary not built")
    return BIN


def test_corpus_parity(rtl433, tmp_path):
    from test_decoder_oracle import VECTORS

    seen = set()
    n_pass = n_diff = n_nodecode = n_unsupported = 0
    diffs = []
    for num, code, min_events in VECTORS:
        if isinstance(num, str) or num in seen or min_events == 0:
            continue
        seen.add(num)
        path = build_corpus_entry(num, code, str(tmp_path))
        if path is None:
            n_unsupported += 1
            continue
        ref = _ref_events(num, path)
        ours = _our_events(num, path)
        if ours == ref and ref:
            n_pass += 1
        elif ours == ref:
            n_nodecode += 1
        else:
            n_diff += 1
            if len(diffs) < 10:
                diffs.append((num, len(ours), len(ref),
                              ours[:1], ref[:1]))
    total = n_pass + n_diff + n_nodecode
    print(f"\nIQ corpus parity: {n_pass}/{total} protocols bit-identical "
          f"with >=1 event ({n_nodecode} decode on neither side, "
          f"{n_diff} DIFF, {n_unsupported} modulation unsupported)")
    for d in diffs:
        print("  DIFF", d)
    assert n_diff == 0, "IQ replay diverged from the reference"
    assert n_pass >= MIN_PARITY_PROTOCOLS
