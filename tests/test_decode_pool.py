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


@pytest.mark.skipif(sys.platform == "win32", reason="fork start method")
def test_sharded_engine_pool_matches_inline():
    """ShardedEngine.drain_events with the pool must equal the inline
    path (same events, same order) on a multi-channel block."""
    import numpy as np
    import jax

    from rtl_433_tpu.dsp.engine import DetectorParams
    from rtl_433_tpu.parallel import make_mesh
    from rtl_433_tpu.parallel.sharding import ShardedEngine
    from synth import synth_ook

    def burst():
        def nexus_bits(id_):
            v = ((id_ << 28) | (1 << 27) | (1 << 24)
                 | ((215 & 0xFFF) << 12) | (0xF << 8) | 45)
            return format(v, "036b")
        from synth import ppm_pulses
        return synth_ook(
            ppm_pulses(nexus_bits(0x5A), pulse_us=500, gap_zero_us=1000,
                       gap_one_us=2000, reset_us=4000, repeats=4),
            rate=250_000, lead_in_us=20_000, tail_us=30_000, seed=9)

    iq1 = burst()
    n = 131072
    blk = np.full((8, n, 2), 128, np.uint8)
    for ch in (0, 3, 5):
        blk[ch, :min(n, iq1.shape[0])] = iq1[:n]

    params = DetectorParams()

    def run(pooled):
        from rtl_433_tpu.decoders import Registry
        reg = Registry()
        reg.register_all()
        eng = ShardedEngine(params, 8, make_mesh(), registry=reg)
        if pooled:
            eng.use_decode_pool(2)
        try:
            eng.push(blk, n_valid=n, flush=True)
            from rtl_433_tpu.output.data_model import event_to_json
            return [(c, event_to_json(ev)) for c, ev in eng.drain_events()]
        finally:
            eng.close_decode_pool()

    inline = run(False)
    pooled = run(True)
    assert inline and inline == pooled
