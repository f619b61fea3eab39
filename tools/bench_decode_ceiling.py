#!/usr/bin/env python
"""Host decode ceiling: packages/s through the full dispatch.

The TPU detector publishes packages far faster than Python can decode
them; this measures where host decode becomes the wall (VERDICT r2 item
6), for the three content regimes the dispatch caches distinguish:

  hot   — the same package repeats (train memo + decode cache hit)
  warm  — a rotating set of 64 distinct trains (memo hit after 1 cycle)
  cold  — every package is novel content (full slice + gate + decode)

Run: JAX_PLATFORMS=cpu python tools/bench_decode_ceiling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def make_pd(id_, temp_dc, hum):
    from rtl_433_tpu.pulse.data import PulseData
    from synth import ppm_pulses

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


def rate(fn, n):
    t0 = time.time()
    for i in range(n):
        fn(i)
    return n / (time.time() - t0)


def main():
    from rtl_433_tpu.decoders import Registry

    reg = Registry()
    reg.register_all()
    sink = []
    cb = lambda dev, ev: sink.append(ev)

    hot_pd = make_pd(0x5A, 215, 45)
    warm_pds = [make_pd(0x10 + i, 200 + i, 40 + i % 30) for i in range(64)]
    cold_pds = [make_pd(0x80 + (i % 120), (i * 7) % 4096, i % 99)
                for i in range(512)]

    # warm up caches
    for _ in range(3):
        reg.run_ook_demods(hot_pd, cb)
    for pd in warm_pds:
        reg.run_ook_demods(pd, cb)

    r_hot = rate(lambda i: reg.run_ook_demods(hot_pd, cb), 400)
    r_warm = rate(lambda i: reg.run_ook_demods(warm_pds[i % 64], cb), 256)

    def cold(i):
        reg._train_cache.clear()
        reg._dec_cache.clear()
        reg.run_ook_demods(cold_pds[i % 512], cb)
    r_cold = rate(cold, 40)

    print(f"decode ceiling (packages/s, single core):")
    print(f"  hot  (repeat content):      {r_hot:8.0f}")
    print(f"  warm (64-train rotation):   {r_warm:8.0f}")
    print(f"  cold (novel content):       {r_cold:8.0f}")
    # the 10k-channel north star at one package per sensor per 60 s needs
    # ~167 pkg/s; at one per 2.1 s (bench cadence) ~4762 pkg/s
    for need, tag in ((167, "10k ch @ 60 s cadence"),
                      (4762, "10k ch @ 2.1 s cadence")):
        ok_h = "ok" if r_hot >= need else "WALL"
        ok_w = "ok" if r_warm >= need else "WALL"
        ok_c = "ok" if r_cold >= need else "WALL"
        print(f"  vs {tag}: hot {ok_h}, warm {ok_w}, cold {ok_c}")
    assert sink


if __name__ == "__main__":
    main()
