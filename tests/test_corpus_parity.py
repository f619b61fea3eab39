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

# 374 of 375 attempted protocols replay bit-identically; the lone
# remaining NODECODE is ant_antplus: its 1 us bits toggle at up to 1 MHz,
# above the FM demodulator's low-pass cutoff (sample_rate/10) at any
# cu8-realistic rate, so no IQ capture can carry it through the reference
# pipeline either (ref src/baseband.c FM LPF; src/devices/ant_antplus.c)
MIN_PARITY_PROTOCOLS = 374


def _normalize(ev):
    ev = dict(ev)
    ev.pop("time", None)
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in ev.items()}


def _ref_events(num, path):
    """num may be an int or a list of ints (multi-protocol streams)."""
    nums = num if isinstance(num, (list, tuple)) else [num]
    args = []
    for n in nums:
        args += ["-R", str(n)]
    out = subprocess.run([BIN, *args, "-r", str(path), "-F", "json"],
                         capture_output=True, text=True, timeout=60)
    return [_normalize(json.loads(l)) for l in out.stdout.splitlines()
            if l.startswith("{")]


def _our_events(num, path):
    """num may be an int or a list of ints (multi-protocol streams)."""
    from rtl_433_tpu.api import RtlTpu
    from rtl_433_tpu.output.data_model import event_to_json
    nums = num if isinstance(num, (list, tuple)) else [num]
    rx = RtlTpu(register_all=False, report_time="off")
    for n in nums:
        rx.registry.register(n)
    evs = rx.decode_file(str(path))
    return [_normalize(json.loads(event_to_json(e))) for e in evs]


# per-protocol fitted FSK lock-head variant (see _FSK_HEADS), learned once
# per session by replaying against the reference binary
_HEAD_FIT: dict = {}

# candidate sacrificial lock heads for FSK PCM packages: the tracker eats
# a signal-dependent number of leading bit periods while locking and labels
# the first tone as the mark, so different decoders want different heads —
# none for exact-length windows (danfoss), alternating for 0xAA preambles,
# alternating + copies of the frame's first 16 bits for 0x33/0xCC syncs.
_FSK_HEADS = ("lock+copy", "lock", "copy", "none", "longlock", "rowlock")


def _head_bits(head, bits):
    f16 = [(bits.bb[0][i // 8] >> (7 - i % 8)) & 1
           for i in range(min(16, bits.bits_per_row[0]))]
    lock = [1, 0] * 8
    if head == "lock+copy":
        return lock + f16 * 3
    if head == "lock":
        return lock
    if head == "copy":
        return f16
    if head == "longlock":
        return lock * 3
    return []


# per-protocol transmitter clock offset: some specs are only decodable
# when the transmitter runs slightly fast — watts_wfht_rf's Manchester
# bit period (2*460 us) exceeds its own reset_limit (900 us), so a
# nominal-clock '10' transition gap flushes mid-frame; real devices
# evidently clock ~5% fast (ref src/devices/watts_wfht_rf.c:142-148)
_TIME_SCALE = {348: 0.95}


def build_corpus_entry(num, code, tmpdir, amp=100, noise=2.0,
                       time_scale=1.0, jitter=0.0, seed_extra=0,
                       fit_head=True):
    """Vector -> cu8 file, or None when the modulation is not invertible.

    Impairment knobs model real-capture warts for the noisy replay suite
    (tests/test_corpus_noisy.py): ``amp``/``noise`` set the SNR,
    ``time_scale`` applies a transmitter clock offset to every width, and
    ``jitter`` adds per-edge uniform timing error (fraction of the width).

    For FSK packages the sacrificial lock head is *fitted*: candidate
    heads are replayed through the reference binary and the first that
    decodes is kept (cached per protocol). Fitting tunes only the synth —
    parity is still judged by diffing both pipelines on the same file.
    """
    import numpy as np
    from rtl_433_tpu.bits.bitbuffer import BitBuffer
    from rtl_433_tpu.decoders import Registry
    reg = Registry()
    dev = reg.get(num)
    if dev is None:
        return None
    if time_scale == 1.0:
        time_scale = _TIME_SCALE.get(num, 1.0)
    bits = None
    prebuilt = False
    if code.upper().replace(" ", "").startswith("AAB"):
        # RfRaw (Portisch B0/B1) vector: explicit bucket timings — parse
        # in the us domain (1 MS/s) and synthesize directly
        from rtl_433_tpu.pulse.data import rfraw_parse
        pd = rfraw_parse(code, sample_rate=1_000_000)
        if pd is None or not pd.pulse:
            return None
        train = [(float(p), float(g)) for p, g in zip(pd.pulse, pd.gap)]
        train[-1] = (train[-1][0],
                     max(train[-1][1], dev.reset_limit * 1.5 + 1000))
        prebuilt = True
    elif "|" in code:
        # multi-part transmission (e.g. secplus_v1 rolling halves): each
        # part is its own package; the per-part end gap separates them
        train = []
        for part in code.split("|"):
            tr = modulate(BitBuffer.parse(part), dev)
            if tr is None:
                return None
            train += tr
        prebuilt = True
    else:
        bits = BitBuffer.parse(code)
        train = modulate(bits, dev)
        if train is None:
            return None

    def _impair(tr):
        if time_scale == 1.0 and not jitter:
            return tr
        rng = np.random.default_rng(1000 + num + seed_extra)
        return [(p * time_scale * (1 + rng.uniform(-jitter, jitter)),
                 g * time_scale * (1 + rng.uniform(-jitter, jitter)))
                for p, g in tr]

    train = _impair(train)
    # short-bit protocols need high-band rates for >=10-sample pulses
    # (PD_MIN_PULSE_SAMPLES); sub-12us bits (M-Bus, Orion, EnOcean...)
    # need the 4 MS/s tier
    if dev.short_width >= 60:
        rate = 250_000
    elif dev.short_width >= 12:
        rate = 1_024_000
    elif dev.short_width >= 3:
        rate = 4_096_000
    else:
        rate = 8_192_000  # 1 us bits (ANT+) -> ~8 samples/bit
    ook_pcm = (not dev.is_fsk and dev.modulation == "OOK_PULSE_PCM"
               and dev.short_width == dev.long_width and dev.short_width > 0)

    def render(head):
        if not dev.is_fsk:
            tr = train
            if ook_pcm and head != "none" and bits is not None:
                # OOK cannot transmit the frame's leading zeros; a
                # sacrificial head re-encoded INTO the PCM bitstream
                # preserves the frame's own bit phase (cf. _pcm docs)
                tr2 = modulate(bits, dev, head_bits=_head_bits(head, bits))
                if tr2 is not None:
                    tr = _impair(tr2)
            return synth_ook(tr, rate=rate, amp=amp, noise=noise,
                             lead_in_us=16_000, tail_us=80_000,
                             seed=num + seed_extra)
        seq = []
        # the FSK tracker eats ~16 bit periods while locking (both
        # pipelines identically); real transmitters front-load extra
        # preamble — do the same for PCM where a bit period is defined
        if (dev.short_width == dev.long_width and dev.short_width > 0
                and bits is not None):
            for hb in _head_bits("lock" if head == "rowlock" else head,
                                 bits):
                seq.append((dev.short_width * time_scale, bool(hb)))
            if head == "rowlock" and dev.gap_limit > 0 \
                    and dev.reset_limit > dev.gap_limit:
                # sacrificial head as its OWN bitbuffer row: a row-break
                # gap in (gap_limit, reset] isolates the lock bits so
                # repeated-row decoders (e.g. ced7000 find_repeated_row)
                # still see their identical frame rows
                seq.append(((dev.gap_limit + dev.reset_limit) / 2
                            * time_scale, False))
        for p, g in train[:-1]:
            seq.append((p, True))
            seq.append((g, False))
        # keep trailing space bits on-carrier (f2) before carrier-off —
        # the final modulator gap is data zeros + the reset end-gap
        end_gap = dev.reset_limit * 1.5 + 1000
        trailing = max(0.0, train[-1][1] - end_gap)
        if head == "rowlock" and dev.gap_limit > 0 \
                and dev.reset_limit > dev.gap_limit:
            # every row break appends min(round(gap/l), max_zeros) zeros;
            # give the LAST row the same on-carrier space as the interior
            # row gaps so all frame rows stay bit-identical (repeated-row
            # decoders compare rows against each other, not the vector)
            trailing = max(trailing,
                           (dev.gap_limit + dev.reset_limit) / 2
                           * time_scale)
        seq.append((train[-1][0], True))
        if trailing > 0:
            seq.append((trailing, False))
        # scale the mark/space tones with the rate so the FM deviation
        # stays above the FSK tracker's delta (6000 int16-phase units): a
        # fixed 40 kHz separation is only ~2550 units at 1.024 MS/s
        return synth_fsk(seq, rate=rate, f1_hz=rate * 60_000 / 250_000,
                         f2_hz=rate * 20_000 / 250_000, amp=amp,
                         noise=noise, lead_in_us=16_000, tail_us=80_000,
                         seed=num + seed_extra)

    name = f"g{num:03d}_433.92M_{rate // 1000}k.cu8"
    path = os.path.join(tmpdir, name)
    fittable = (fit_head and not prebuilt and os.path.exists(BIN)
                and ((dev.is_fsk and dev.short_width == dev.long_width
                      and dev.short_width > 0) or ook_pcm))
    if not fittable:
        default = _FSK_HEADS[0] if dev.is_fsk else "none"
        render(_HEAD_FIT.get(num, default)).tofile(path)
        return path
    if num in _HEAD_FIT:
        render(_HEAD_FIT[num]).tofile(path)
        return path
    heads = _FSK_HEADS if dev.is_fsk else ("none", "copy", "lock")
    for head in heads:
        render(head).tofile(path)
        if _ref_events(num, path):
            _HEAD_FIT[num] = head
            return path
    _HEAD_FIT[num] = heads[0]
    render(heads[0]).tofile(path)
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
