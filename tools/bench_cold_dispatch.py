#!/usr/bin/env python
"""Cold-novel dispatch throughput (VERDICT r4 item 3 'measured').

Measures packages/s through the FULL dispatch when every package carries
novel content (train memo + decode cache cleared per round), in the two
production regimes:

  per-train   — packages arrive one at a time (run_ook_demods per pkg;
                host native slicing + batched declarative decode per train)
  drain       — a whole drain of packages arrives at once (the 10k-channel
                scenario): device-kernel slicing + on-device content dedup
                + one batched declarative decode for the drain
                (prewarm_trains), then per-package dispatch

Workload: Nexus-like PPM packages with distinct payloads vs the full
default registry (192 OOK decoders), the same shape as
tools/bench_decode_ceiling.py's cold regime.

Run: python tools/bench_cold_dispatch.py            (TPU)
     JAX_PLATFORMS=cpu python tools/bench_cold_dispatch.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

N_PKGS = int(os.environ.get("COLD_PKGS", "128"))
ROUNDS = int(os.environ.get("COLD_ROUNDS", "3"))


def make_pd(i):
    from rtl_433_tpu.pulse.data import PulseData
    from synth import ppm_pulses

    id_, temp_dc, hum = 0x30 + (i % 200), (i * 11) % 4096, i % 99
    v = ((id_ << 28) | (1 << 27) | (0 << 26) | (1 << 24)
         | ((temp_dc & 0xFFF) << 12) | (0xF << 8) | hum)
    bits = format(v, "036b")
    pd = PulseData(sample_rate=250_000)
    pulses = ppm_pulses(bits, pulse_us=500, gap_zero_us=1000,
                        gap_one_us=2000, reset_us=4000, repeats=4)
    pd.pulse = [p // 4 for p, g in pulses]
    pd.gap = [g // 4 for p, g in pulses]
    pd.ook_low_estimate = 10
    pd.ook_high_estimate = 8000
    return pd


def main():
    import jax
    from rtl_433_tpu.decoders import Registry

    backend = jax.default_backend()
    pds = [make_pd(i) for i in range(N_PKGS)]
    sink = []
    cb = lambda dev, ev: sink.append(ev)
    out = {"metric": "cold_dispatch", "backend": backend,
           "packages": N_PKGS}

    # per-train regime
    reg = Registry()
    reg.register_all()
    reg.run_ook_demods(pds[0], cb)    # warm compile/caches
    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for pd in pds:
            reg._train_cache.clear()
            reg._dec_cache.clear()
            reg.run_ook_demods(pd, cb)
        best = max(best, N_PKGS / (time.perf_counter() - t0))
    out["per_train_pkg_s"] = round(best, 1)

    # drain regime (device-kernel slicing + drain-batched decode)
    reg = Registry()
    reg.register_all()
    reg.device_slice = True
    trains = [(False, pd.pulse, pd.gap) for pd in pds]
    for _ in range(2):                # compile + cache warm
        reg._train_cache.clear()
        reg._dec_cache.clear()
        reg.prewarm_trains(trains, 250_000)
        for pd in pds:
            reg.run_ook_demods(pd, cb)
    best = 0.0
    for _ in range(ROUNDS):
        reg._train_cache.clear()
        reg._dec_cache.clear()
        t0 = time.perf_counter()
        reg.prewarm_trains(trains, 250_000)
        for pd in pds:
            reg.run_ook_demods(pd, cb)
        best = max(best, N_PKGS / (time.perf_counter() - t0))
    out["drain_pkg_s"] = round(best, 1)
    assert sink, "nothing decoded"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
