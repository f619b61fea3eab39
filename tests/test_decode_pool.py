"""DecodePool: worker-process decode fan-out must be event-identical and
order-preserving vs the inline dispatch (ref src/sdr.c:1718 acquire/decode
thread split, generalised to N workers with channel affinity)."""

import sys

import pytest

from rtl_433_tpu.decoders import Registry
from rtl_433_tpu.decoders.pool import DecodePool
from rtl_433_tpu.output.data_model import event_to_json
from rtl_433_tpu.pulse.data import PulseData

from synth import ppm_pulses


def _nexus_pd(id_, temp_dc):
    def nexus_bits(id_, bat, test, ch, temp_dc, hum):
        v = ((id_ << 28) | (bat << 27) | (test << 26) | (ch << 24)
             | ((temp_dc & 0xFFF) << 12) | (0xF << 8) | hum)
        return format(v, "036b")
    pd = PulseData(sample_rate=250_000)
    pulses = ppm_pulses(nexus_bits(id_, 1, 0, 1, temp_dc, 45), pulse_us=500,
                        gap_zero_us=1000, gap_one_us=2000, reset_us=4000,
                        repeats=4)
    pd.pulse = [p // 4 for p, g in pulses]
    pd.gap = [g // 4 for p, g in pulses]
    pd.ook_low_estimate = 10
    pd.ook_high_estimate = 8000
    return pd


@pytest.mark.skipif(sys.platform == "win32", reason="fork start method")
def test_pool_matches_inline_and_preserves_order():
    reg = Registry()
    reg.register_all()

    jobs = [(ch, _nexus_pd(0x10 + ch, 200 + 7 * i))
            for i, ch in enumerate([3, 1, 2, 0, 3, 1])]

    # inline reference: same packages, same order
    inline = []
    for ch, pd in jobs:
        reg.run_ook_demods(
            pd, lambda dev, ev, c=ch: inline.append((c, event_to_json(ev))))

    with DecodePool(reg, n_workers=2) as pool:
        for ch, pd in jobs:
            pool.submit(ch, False, pd)
        got = [(c, event_to_json(ev)) for c, dev, ev in pool.drain()]

    assert got == inline
    assert len(got) >= len(jobs)  # nexus emits >= 1 event per package


@pytest.mark.skipif(sys.platform == "win32", reason="fork start method")
def test_pool_channel_affinity_keeps_stateful_order():
    """Two identical channels' package streams must each see their own
    worker in order (channel affinity) — sanity-check the routing."""
    reg = Registry()
    reg.register_all()
    with DecodePool(reg, n_workers=3) as pool:
        for i in range(9):
            pool.submit(i % 3, False, _nexus_pd(0x42, 215))
        res = pool.drain()
    # every package decoded, sequence order preserved
    assert len(res) >= 9
    chans = [c for c, _, _ in res]
    # events come back grouped by submission order: ch pattern 0,1,2,...
    assert chans[:3] == [0, 1, 2]
