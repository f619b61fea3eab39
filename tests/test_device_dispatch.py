"""Device-kernel dispatch parity: prewarmed batched slicing must produce
exactly the host dispatch's event stream (content, order, accounting).

The device path (decoders/device_dispatch.py) slices a drain's packages
against the PPM/PWM/PCM spec families with batched XLA kernels and
pre-fills the train-memo cache; flagged lanes and the remaining families
use the host slicers. Both dispatches share Registry._memo_plans, so the
contract is end-to-end equality on the same inputs."""

import glob
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _events_for(cu8, num, device_slice):
    from rtl_433_tpu.api import RtlTpu
    from rtl_433_tpu.output.data_model import event_to_json
    rx = RtlTpu(register_all=False, report_time="off",
                device_slice=device_slice)
    rx.registry.register(num)
    evs = rx.decode_file(str(cu8))
    return [json.loads(event_to_json(e)) for e in evs]


def test_fixture_corpus_device_vs_host():
    cases = []
    for cu8 in sorted(glob.glob(os.path.join(FIXTURES, "*", "*.cu8"))):
        with open(os.path.join(os.path.dirname(cu8), "protocol")) as f:
            cases.append((cu8, int(f.read().strip())))
    assert len(cases) >= 10
    for cu8, num in cases:
        host = _events_for(cu8, num, False)
        dev = _events_for(cu8, num, True)
        assert dev == host, (
            f"{os.path.basename(cu8)}: device {dev} != host {host}")
        assert host, f"{os.path.basename(cu8)} decoded nothing"


def _mk_registry(device_slice):
    from rtl_433_tpu.decoders import Registry
    reg = Registry()
    reg.register_all()
    reg.device_slice = device_slice
    return reg


def _dispatch_all(reg, trains, rate, prewarm):
    """Run every train through the registry; return (events, stats)."""
    from rtl_433_tpu.pulse.data import PulseData
    if prewarm:
        n = reg.prewarm_trains(
            [(fsk, p, g) for fsk, p, g in trains], rate)
        assert n > 0
    out = []
    for fsk, p, g in trains:
        pd = PulseData(sample_rate=rate)
        pd.pulse = list(p)
        pd.gap = list(g)
        got = []
        reg._run(pd, want_fsk=fsk,
                 event_cb=lambda dev, ev: got.append(
                     (dev.num, dev.symbol, list(ev.fields))))
        out.append(got)
    stats = {d.symbol: (d.decode_events, d.decode_ok,
                        dict(sorted(d.decode_fails.items())))
             for d in reg.active}
    return out, stats


def _fuzz_trains(rng, n):
    """Width mixtures spanning the PPM/PWM/PCM families plus odd shapes."""
    from rtl_433_tpu.decoders import Registry
    reg = Registry()
    devs = [d for d in reg.slots if d is not None and d.decode_fn]
    trains = []
    for i in range(n):
        dev = devs[int(rng.integers(len(devs)))]
        spu = 250_000 / 1e6
        cands = [max(1.0, dev.short_width), max(1.0, dev.long_width),
                 max(1.0, dev.sync_width or dev.short_width),
                 max(2.0, dev.reset_limit)]
        k = int(rng.integers(4, 50))
        pulses, gaps = [], []
        for _ in range(k):
            p = cands[int(rng.integers(3))] * (1 + rng.uniform(-0.2, 0.2))
            g = cands[int(rng.integers(4))] * (1 + rng.uniform(-0.2, 0.2))
            pulses.append(max(1, int(p * spu)))
            gaps.append(max(1, int(g * spu)))
        gaps[-1] = int(max(10.0, dev.reset_limit) * spu * 1.5) + 10
        trains.append((bool(dev.is_fsk), pulses, gaps))
    return trains


def test_fuzz_device_vs_host_dispatch(monkeypatch):
    # secplus_v1 pairs its two halves by wall clock (0.8 s window, ref
    # src/devices/secplus_v1.c:137); freeze it so host/device runs see
    # identical pairing regardless of dispatch speed
    import rtl_433_tpu.decoders.garage as garage

    class _Frozen:
        @staticmethod
        def monotonic():
            return 0.0

    monkeypatch.setattr(garage, "time", _Frozen)
    rng = np.random.default_rng(7)
    trains = _fuzz_trains(rng, 40)
    host_reg = _mk_registry(False)
    dev_reg = _mk_registry(True)
    host_ev, host_stats = _dispatch_all(host_reg, trains, 250_000,
                                        prewarm=False)
    dev_ev, dev_stats = _dispatch_all(dev_reg, trains, 250_000,
                                      prewarm=True)
    for i, (h, d) in enumerate(zip(host_ev, dev_ev)):
        assert d == h, f"train {i}: {d[:2]} != {h[:2]}"
    assert dev_stats == host_stats


def test_prewarm_fills_memo_cache():
    """After prewarm, dispatch must not slice on the host: poke the memo
    cache directly."""
    rng = np.random.default_rng(11)
    trains = _fuzz_trains(rng, 6)
    reg = _mk_registry(True)
    reg.prewarm_trains(trains, 250_000)
    for fsk, p, g in trains:
        tkey = (bool(fsk), 250_000,
                np.asarray(p, np.int32).tobytes(),
                np.asarray(g, np.int32).tobytes())
        assert tkey in reg._train_cache


def test_serialize_matches_native_records():
    """Device-path record serialization is byte-identical to the native
    arena format for the same logical bitbuffer."""
    from rtl_433_tpu.pulse import native_slicers
    if not native_slicers.available():
        pytest.skip("native bank unavailable")
    from rtl_433_tpu.decoders import Registry
    from rtl_433_tpu.decoders.device_dispatch import serialize_bitbuffer
    from rtl_433_tpu.pulse.data import PulseData
    from rtl_433_tpu.pulse import slicers

    reg = Registry()
    reg.register_all()
    devs = [d for d in reg.active if not d.is_fsk]
    bank = native_slicers.SlicerBank(devs, 250_000)
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(8):
        dev = devs[int(rng.integers(len(devs)))]
        spu = 250_000 / 1e6
        k = int(rng.integers(6, 40))
        pulses = [max(1, int(dev.short_width * spu
                             * (1 + rng.uniform(-0.2, 2.0))))
                  for _ in range(k)]
        gaps = [max(1, int(max(dev.long_width, 10) * spu
                           * (1 + rng.uniform(-0.2, 2.0))))
                for _ in range(k)]
        gaps[-1] = int(max(10.0, dev.reset_limit) * spu * 2) + 10
        summary, _ = bank.slice(np.asarray(pulses, np.int32),
                                np.asarray(gaps, np.int32))
        pd = PulseData(sample_rate=250_000)
        pd.pulse, pd.gap = pulses, gaps
        # group native records per spec, in temporal order
        per_spec = {}
        for row in summary:
            per_spec.setdefault(int(row[0]), []).append(
                bank.record_bytes(int(row[1])))
        for s, blobs in per_spec.items():
            host = [serialize_bitbuffer(bb)
                    for bb in slicers.slice_pulses(pd, devs[s])]
            assert host == blobs, f"{devs[s].symbol} record mismatch"
            checked += len(blobs)
    assert checked > 20, checked


def test_sharded_engine_device_slice_parity():
    """ShardedEngine.drain_events with device_slice prewarms the memo
    cache and yields the identical channel-tagged event stream."""
    from rtl_433_tpu.decoders import Registry
    from rtl_433_tpu.output.data_model import event_to_json
    from rtl_433_tpu.parallel.sharding import ShardedEngine, make_mesh
    from test_sharding import _params, _nexus_iq

    params = _params()
    channels, n = 4, 98304
    iq = np.zeros((channels, n, 2), np.uint8) + 128
    for c in range(0, channels, 2):
        iq[c] = _nexus_iq(n, seed=c)

    runs = {}
    for mode in (False, True):
        reg = Registry()
        reg.register_all()
        reg.device_slice = mode
        eng = ShardedEngine(params, channels, make_mesh(4), registry=reg)
        eng.push(iq, flush=True)
        runs[mode] = [(c, event_to_json(ev))
                      for c, ev in eng.drain_events()]
        if mode:
            assert reg._train_cache, "prewarm did not fill the memo cache"
    assert runs[True] == runs[False]
    assert any("Nexus" in e for _, e in runs[True])
