"""End-to-end decode parity: IQ file -> events, ours vs the rtl_433 binary.

Synthesizes protocol-valid signals, decodes with both implementations and
diffs the JSON events (including the file-position time field).
"""

import json
import os
import subprocess

import numpy as np
import pytest

from rtl_433_tpu.api import RtlTpu
from rtl_433_tpu.bits import util
from rtl_433_tpu.output.data_model import event_to_json

from synth import synth_ook, synth_fsk, pwm_pulses, ppm_pulses, fsk_pcm_bits

BIN = "/tmp/rtlbuild/src/rtl_433"

needs_ref = pytest.mark.skipif(not os.path.exists(BIN),
                               reason="reference binary not built")


def run_reference_json(path, rate=250_000, extra=()):
    out = subprocess.run(
        [BIN, "-r", f"cu8:{path}", "-s", str(rate), "-F", "json", *extra],
        capture_output=True, text=True, timeout=120)
    return [json.loads(l) for l in out.stdout.splitlines() if l.strip()]


def run_ours_json(path, rate=250_000, fsk_mode="auto"):
    rx = RtlTpu(sample_rate=rate, fsk_mode=fsk_mode, report_time="samples")
    evs = rx.decode_file(f"cu8:{path}")
    return [json.loads(event_to_json(e)) for e in evs]


def assert_events_equal(ours, refs):
    assert len(ours) == len(refs), (ours, refs)
    for a, b in zip(ours, refs):
        assert a == b, f"\nours: {a}\nref:  {b}"


@needs_ref
def test_nexus_ppm_e2e(tmp_path):
    def nexus_bits(id_, bat, test, ch, temp_dc, hum):
        v = ((id_ << 28) | (bat << 27) | (test << 26) | (ch << 24)
             | ((temp_dc & 0xFFF) << 12) | (0xF << 8) | hum)
        return format(v, "036b")

    bits = nexus_bits(0x5A, 1, 0, 1, 215, 45)
    iq = synth_ook(ppm_pulses(bits, pulse_us=500, gap_zero_us=1000,
                              gap_one_us=2000, reset_us=4000, repeats=4),
                   rate=250_000, lead_in_us=20_000, tail_us=120_000, seed=42)
    p = tmp_path / "nexus.cu8"
    iq.tofile(p)
    assert_events_equal(run_ours_json(p), run_reference_json(p))


@needs_ref
def test_silvercrest_pwm_e2e(tmp_path):
    # 33-bit rows: 7c 26 <cmd> <lut[cmd]> + trailing bit; row 1 checked
    lut = [2, 3, 0, 1, 4, 5, 7, 6, 0xC, 0xD, 0xF, 0xE, 8, 9, 0xB, 0xA]
    cmd = 5
    msg = (0x7C << 25) | (0x26 << 17) | (cmd << 9) | (lut[cmd] << 1)
    bits = format(msg, "033b")
    # PWM short=264 long=744, gap 5000 row-break, reset 12000
    train = []
    for rep in range(3):
        for k, b in enumerate(bits):
            last = k == len(bits) - 1
            gap = 6000 if last else (744 if b == "1" else 264)
            train.append((264 if b == "1" else 744, gap))
    train[-1] = (train[-1][0], 16000)
    iq = synth_ook(train, rate=250_000, lead_in_us=20_000, tail_us=120_000,
                   seed=2)
    p = tmp_path / "silvercrest.cu8"
    iq.tofile(p)
    ours = run_ours_json(p)
    refs = run_reference_json(p)
    assert any(e.get("model") == "Silvercrest-Remote" for e in ours)
    assert_events_equal(ours, refs)


@needs_ref
def test_rubicson_crc_e2e(tmp_path):
    # Rubicson: PPM short=1000 long=2000 gap=3000 reset=4800 (see registry),
    # 36-bit rows where nibbles 7-8 are CRC-8 (0x31, init 0x6c)
    id_, bat, ch, temp_dc = 0x3C, 1, 2, -55  # -5.5 C
    b0 = id_
    b1 = (bat << 7) | ((ch - 1) << 4) | ((temp_dc >> 8) & 0x0F)
    b2 = temp_dc & 0xFF
    b3_hi = 0xF0
    crc = util.crc8(bytes([b0, b1, b2, b3_hi, 0]), 5, 0x31, 0x6C)
    # crc over [b0,b1,b2,b3&0xf0, crc_nibbles<<4...] must equal stored value;
    # solve: stored nibbles are crc of message with crc bytes zeroed? The
    # reference computes crc over (b0,b1,b2,b3&f0, crc<<4|crc>>4) == 0 check
    # is "chk != 0 -> fail" with tmp[4] holding the received crc nibbles.
    # crc8 of [m..., r] == 0  <=>  r == crc8([m...]) for this poly/init? No:
    # crc8([m,r]) = crc8_update(crc8([m]), r). Brute force the byte:
    want = None
    for r in range(256):
        if util.crc8(bytes([b0, b1, b2, b3_hi, r]), 5, 0x31, 0x6C) == 0:
            want = r
            break
    assert want is not None
    v = (b0 << 28) | (b1 << 20) | (b2 << 12) | (0xF << 8) | want
    bits = format(v, "036b")
    iq = synth_ook(ppm_pulses(bits, pulse_us=500, gap_zero_us=1000,
                              gap_one_us=2000, reset_us=3500, repeats=4),
                   rate=250_000, lead_in_us=20_000, tail_us=120_000, seed=9)
    p = tmp_path / "rubicson.cu8"
    iq.tofile(p)
    ours = run_ours_json(p)
    refs = run_reference_json(p)
    assert any(e.get("model") == "Rubicson-Temperature" for e in ours)
    assert_events_equal(ours, refs)


@needs_ref
def test_lacrosse_tx35_fsk_e2e(tmp_path):
    # LaCrosse TX35: FSK PCM NRZ bit 55us; frame: preamble aa, sync 2dd4,
    # model nibble 9, 36 payload bits, crc8 poly 0x31 over 4 bytes
    id_ = 23
    temp = 61.5  # +40 encoded as BCD 6,1,5
    hum = 40
    b0 = 0x90 | (id_ >> 2)
    b1 = ((id_ & 3) << 6) | (0 << 5) | 6
    b2 = 0x15
    b3 = hum
    crc = util.crc8(bytes([b0, b1, b2, b3]), 4, 0x31, 0x00)
    payload = f"{b0:08b}{b1:08b}{b2:08b}{b3:08b}{crc:08b}"[4:]  # after 9 nibble
    bits = "10101010" * 4 + "0010110111010100" + "1001" + payload
    iq = synth_fsk(fsk_pcm_bits(bits, bit_us=55, preamble=""),
                   rate=250_000, lead_in_us=16_000, tail_us=120_000, seed=5)
    p = tmp_path / "lacrosse.cu8"
    iq.tofile(p)
    ours = run_ours_json(p, fsk_mode="classic")
    refs = run_reference_json(p)
    assert any(e.get("model") == "LaCrosse-TX35DTHIT" for e in ours), ours
    assert_events_equal(ours, refs)


@needs_ref
def test_flex_y_parity():
    """-y + -X flex paths produce identical JSON (sans time)."""
    spec = ("n=test,m=OOK_PWM,s=100,l=200,r=300,bits>=4,"
            "get=@0:{4}:first,get=@4:{4}:second:[10:ten 11:eleven]")
    code = "{16}ab42"
    out = subprocess.run(
        [BIN, "-R", "0", "-X", spec, "-y", code, "-F", "json"],
        capture_output=True, text=True, timeout=60)
    ref = json.loads(out.stdout.splitlines()[0])
    ref.pop("time")

    from rtl_433_tpu.decoders.flex import flex_create_device
    rx = RtlTpu(register_all=False)
    rx.registry.add_device(flex_create_device(spec))
    evs = rx.decode_test_string(code)
    ours = json.loads(event_to_json(evs[0]))
    ours.pop("time", None)
    assert ours == ref, (ours, ref)
