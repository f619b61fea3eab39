"""Shared IQ fixture for the multi-host test: deterministic per-channel
blocks (global channels 0..7; process p owns channels 4p..4p+3). Even
channels carry a decodable Nexus burst, odd channels are noise."""

import numpy as np


def _nexus_iq(n, seed):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import synth_ook
    bits = "100111001000000011010111111100101101"
    pulses = []
    for rep in range(4):
        for b in bits:
            pulses.append((500, 1000 if b == "0" else 2000))
        pulses.append((500, 4000))
    sig = synth_ook(pulses, rate=250000, seed=seed)
    rng = np.random.default_rng(seed)
    iq = rng.integers(123, 133, size=(n, 2), dtype=np.uint8)
    seg = sig[: max(0, n - 600)]
    iq[600:600 + seg.shape[0]] = seg
    return iq


def make_global_iq(n=98304, channels=8):
    rng = np.random.default_rng(99)
    iq = np.zeros((channels, n, 2), np.uint8) + 128
    for c in range(channels):
        if c % 2 == 0:
            iq[c] = _nexus_iq(n, seed=c)
        else:
            iq[c] = rng.integers(123, 133, size=(n, 2), dtype=np.uint8)
    return iq


def make_local_iq(pid, per_process=4):
    return make_global_iq()[pid * per_process:(pid + 1) * per_process]
