"""Parity tests against the actual rtl_433 reference binary.

Builds the reference (no SDR libs) into /tmp/rtlbuild on first use and
compares our pulse trains with its `-w file.ook` dumps. Skipped when the
reference source or toolchain is unavailable.
"""

import functools
import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtl_433_tpu.dsp import DetectorParams, detector_init, process_block
from rtl_433_tpu.dsp.engine import take_packages

from synth import synth_ook, synth_fsk, pwm_pulses, fsk_pcm_bits

REF_SRC = "/root/reference"
BUILD = "/tmp/rtlbuild"
BIN = os.path.join(BUILD, "src", "rtl_433")


@pytest.fixture(scope="session")
def rtl433():
    if not os.path.exists(BIN):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source not available")
        os.makedirs(BUILD, exist_ok=True)
        try:
            subprocess.run(
                ["cmake", REF_SRC, "-DENABLE_RTLSDR=OFF", "-DENABLE_SOAPYSDR=OFF",
                 "-DENABLE_OPENSSL=OFF", "-G", "Ninja"],
                cwd=BUILD, check=True, capture_output=True, timeout=300)
            subprocess.run(["ninja", "rtl_433"], cwd=BUILD, check=True,
                           capture_output=True, timeout=600)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"could not build reference: {e}")
    return BIN


def parse_ook_dump(path, rate):
    """Parse rtl_433 -w .ook output back into sample-width pulse trains."""
    to_samples = rate / 1e6
    pkgs = []
    cur = None
    for line in open(path):
        line = line.strip()
        if line.startswith(";ook") or line.startswith(";fsk"):
            cur = {"type": "FSK" if line.startswith(";fsk") else "OOK",
                   "pulse": [], "gap": [], "freq1": None, "rssi": None,
                   "noise": None}
            pkgs.append(cur)
        elif line.startswith(";freq1") and cur is not None:
            cur["freq1"] = float(line.split()[1])
        elif line.startswith(";rssi"):
            cur["rssi"] = float(line.split()[1])
        elif line.startswith(";noise"):
            cur["noise"] = float(line.split()[1])
        elif line and not line.startswith(";"):
            m, s = line.split()
            cur["pulse"].append(int(round(float(m) * to_samples)))
            cur["gap"].append(int(round(float(s) * to_samples)))
    return pkgs


def run_reference(rtl433, iq, rate, extra=()):
    sig = "/tmp/parity_sig.cu8"
    dump = "/tmp/parity_dump.ook"
    np.asarray(iq, np.uint8).tofile(sig)
    if os.path.exists(dump):
        os.unlink(dump)
    subprocess.run(
        [rtl433, "-r", f"cu8:{sig}", "-s", str(rate), "-w", dump, "-R", "1",
         *extra],
        check=True, capture_output=True, timeout=120)
    return parse_ook_dump(dump, rate)


def run_engine(iq, params):
    N = iq.shape[0]
    pad = (-N) % params.chunk
    iqp = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    state = detector_init(params, 1)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    state, _ = pb(state, jnp.asarray(iqp), jnp.int32(N), flush=True)
    pkgs, _ = take_packages(state)
    return pkgs


def assert_trains_equal(ours, refs, rate):
    assert len(ours) == len(refs), (len(ours), len(refs))
    for e, r in zip(ours, refs):
        assert (e["type"] == 2) == (r["type"] == "FSK")
        n = e["num_pulses"]
        # the .ook dump rounds to whole us; compare in us after same rounding
        to_us = 1e6 / rate
        e_p = [int(round(x * to_us)) for x in e["pulse"].tolist()]
        e_g = [int(round(x * to_us)) for x in e["gap"].tolist()]
        r_p = [int(round(x * to_us)) for x in r["pulse"]]
        r_g = [int(round(x * to_us)) for x in r["gap"]]
        assert e_p == r_p, (e_p, r_p)
        assert e_g == r_g, (e_g, r_g)


def test_ook_pwm_parity(rtl433):
    iq = synth_ook(
        pwm_pulses("110010101001", short_us=264, long_us=744,
                   gap_short_us=744, gap_long_us=264, reset_us=12000,
                   repeats=3),
        rate=250_000, lead_in_us=20_000, tail_us=120_000)
    refs = run_reference(rtl433, iq, 250_000)
    ours = run_engine(iq, DetectorParams())
    assert len(ours) == 3
    assert_trains_equal(ours, refs, 250_000)


def test_fsk_parity_classic(rtl433):
    iq = synth_fsk(fsk_pcm_bits("1100101011110000" * 4, bit_us=100),
                   rate=250_000, lead_in_us=16_000, tail_us=120_000, seed=7)
    refs = run_reference(rtl433, iq, 250_000)
    ours = run_engine(iq, DetectorParams(fsk_minmax=False))
    assert any(p["type"] == 2 for p in ours)
    assert_trains_equal(ours, refs, 250_000)


def test_fsk_parity_minmax(rtl433):
    iq = synth_fsk(fsk_pcm_bits("1100101011110000" * 4, bit_us=100),
                   rate=250_000, lead_in_us=16_000, tail_us=120_000, seed=7)
    refs = run_reference(rtl433, iq, 250_000, extra=("-Y", "minmax"))
    ours = run_engine(iq, DetectorParams(fsk_minmax=True))
    assert_trains_equal(ours, refs, 250_000)


def test_noise_levels_parity(rtl433):
    """rssi/noise headers must match our level estimates after dB rounding."""
    iq = synth_ook(
        pwm_pulses("1010", short_us=300, long_us=900, gap_short_us=900,
                   gap_long_us=300, reset_us=12000, repeats=2),
        rate=250_000, lead_in_us=20_000, tail_us=80_000, seed=11)
    refs = run_reference(rtl433, iq, 250_000)
    ours = run_engine(iq, DetectorParams())
    assert len(ours) == len(refs)
    for e, r in zip(ours, refs):
        rssi = 10 * np.log10(max(e["ook_high_estimate"], 1)) - 42.1442
        noise = 10 * np.log10(max(e["ook_low_estimate"], 1)) - 42.1442
        assert abs(rssi - r["rssi"]) < 0.051, (rssi, r["rssi"])
        assert abs(noise - r["noise"]) < 0.051, (noise, r["noise"])


def test_time_meta_parity(rtl433):
    """-M time:... variants byte-match the reference (modulo the clock
    instant): rel, tz suffix, unix:usec, and the notz->off prefix quirk
    (ref src/rtl_433.c:687-740, src/r_util.c:94-126)."""
    import json
    import re
    vec = "{36}9c80d7f2d {36}9c80d7f2d {36}9c80d7f2d"

    def ref(meta):
        out = subprocess.run([rtl433, "-R", "19", "-y", vec, "-F", "json",
                              "-M", meta], capture_output=True, text=True,
                             timeout=60)
        return [json.loads(l) for l in out.stdout.splitlines()
                if l.startswith("{")]

    def ours(meta):
        out = subprocess.run(
            ["python", "-m", "rtl_433_tpu.cli", "-R", "19", "-y", vec,
             "-F", "json", "-M", meta],
            capture_output=True, text=True, timeout=120,
            cwd="/root/repo", env={**os.environ, "JAX_PLATFORMS": "cpu"})
        return [json.loads(l) for l in out.stdout.splitlines()
                if l.startswith("{")]

    for meta in ("time:rel", "time:notz", "time:utc:tz", "time:unix:usec"):
        r, o = ref(meta), ours(meta)
        assert len(r) == len(o) > 0, meta
        for re_, oe in zip(r, o):
            rt, ot = re_.pop("time", None), oe.pop("time", None)
            assert re_ == oe, meta
            if meta == "time:rel":
                assert rt == ot == "@0.000000s"
            elif meta == "time:notz":
                assert rt is None and ot is None  # "no" prefix wins
            elif meta == "time:utc:tz":
                # same shape: ISO date + Z / offset suffix
                pat = r"^\d{4}-\d\d-\d\d \d\d:\d\d:\d\d(Z|[+-]\d{4})$"
                assert re.match(pat, rt) and re.match(pat, ot), (rt, ot)
            else:
                assert re.match(r"^\d+\.\d{6}$", rt) and \
                    re.match(r"^\d+\.\d{6}$", ot), (rt, ot)
