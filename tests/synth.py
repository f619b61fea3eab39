"""Synthetic IQ signal generators for tests and golden-fixture creation.

Modeled on the reference's hardware-free test fixture
(ref tests/rtl_tcp_serve.py): OOK pulse trains become an IF tone at 50 kHz,
silence is a flat bias; FSK toggles between two IF tones. Output is CU8
interleaved IQ bytes compatible with ``rtl_433 -r file.cu8``.
"""

from __future__ import annotations

import math

import numpy as np


def _tone(n, rate, freq, amp, phase0=0.0, noise=0.0, rng=None):
    t = np.arange(n)
    ph = phase0 + 2 * math.pi * freq / rate * t
    i = 128 + amp * np.cos(ph)
    q = 128 + amp * np.sin(ph)
    if noise and rng is not None:
        i = i + rng.normal(0, noise, n)
        q = q + rng.normal(0, noise, n)
    end_phase = phase0 + 2 * math.pi * freq / rate * n
    return np.clip(np.stack([i, q], -1), 0, 255).astype(np.uint8), end_phase


def synth_ook(pulses_us, rate=250_000, amp=100, tone_hz=50_000.0,
              lead_in_us=12_000, tail_us=60_000, noise=2.0, seed=0):
    """CU8 for an OOK pulse train given [(pulse_us, gap_us), ...]."""
    rng = np.random.default_rng(seed)
    spu = rate / 1e6
    chunks = []
    phase = 0.0

    def silence(us):
        n = int(round(us * spu))
        i = 128 + rng.normal(0, noise, n)
        q = 128 + rng.normal(0, noise, n)
        chunks.append(np.clip(np.stack([i, q], -1), 0, 255).astype(np.uint8))

    silence(lead_in_us)
    for pulse_us, gap_us in pulses_us:
        n = int(round(pulse_us * spu))
        buf, phase = _tone(n, rate, tone_hz, amp, phase, noise, rng)
        chunks.append(buf)
        silence(gap_us)
    silence(tail_us)
    return np.concatenate(chunks, axis=0)  # [N, 2] uint8


def pwm_pulses(bits, short_us=500, long_us=1000, gap_short_us=1000,
               gap_long_us=500, reset_us=4000, repeats=1):
    """PWM: short pulse = 1, long pulse = 0; constant period."""
    out = []
    for _ in range(repeats):
        for k, b in enumerate(bits):
            last = k == len(bits) - 1
            if b == "1":
                out.append((short_us, reset_us if last else gap_short_us))
            else:
                out.append((long_us, reset_us if last else gap_long_us))
    return out


def ppm_pulses(bits, pulse_us=500, gap_zero_us=1000, gap_one_us=2000,
               reset_us=4000, repeats=1, stop_pulse=True):
    """PPM: gap width encodes the bit; a trailing stop pulse closes the row
    (the final data gap would otherwise be eaten by the row/reset gap)."""
    out = []
    for _ in range(repeats):
        for b in bits:
            out.append((pulse_us, gap_one_us if b == "1" else gap_zero_us))
        if stop_pulse:
            out.append((pulse_us, reset_us))
        else:
            out[-1] = (out[-1][0], reset_us)
    return out


def synth_fsk(bits_us, rate=250_000, amp=100, f1_hz=60_000.0, f2_hz=20_000.0,
              lead_in_us=12_000, tail_us=60_000, noise=2.0, seed=0,
              carrier_amp=None):
    """CU8 for an FSK bit train: [(width_us, is_high), ...].

    The carrier is continuously on (amplitude `amp`), frequency toggles
    between f1 (high/mark) and f2 (low/space). A strong OOK envelope is
    needed so the OOK detector opens its first pulse; the FSK sub-detector
    then tracks the FM discriminator.
    """
    rng = np.random.default_rng(seed)
    spu = rate / 1e6
    chunks = []
    phase = 0.0

    def silence(us):
        n = int(round(us * spu))
        i = 128 + rng.normal(0, noise, n)
        q = 128 + rng.normal(0, noise, n)
        chunks.append(np.clip(np.stack([i, q], -1), 0, 255).astype(np.uint8))

    silence(lead_in_us)
    for width_us, hi in bits_us:
        n = int(round(width_us * spu))
        buf, phase = _tone(n, rate, f1_hz if hi else f2_hz, amp, phase,
                           noise, rng)
        chunks.append(buf)
    silence(tail_us)
    return np.concatenate(chunks, axis=0)


def fsk_pcm_bits(bits, bit_us=100, preamble="10101010" * 2):
    """[(width_us, is_high)] for an FSK PCM (NRZ) bit string with preamble."""
    seq = preamble + bits
    out = []
    run = 1
    for k in range(1, len(seq) + 1):
        if k < len(seq) and seq[k] == seq[k - 1]:
            run += 1
        else:
            out.append((run * bit_us, seq[k - 1] == "1"))
            run = 1
    return out


def write_cu8(path, iq):
    np.asarray(iq, np.uint8).tofile(path)
