"""Device slicing kernels (ops/slice.py) vs the exact Python slicers.

Every (train, spec) pair must produce identical events — row counts,
bits-per-row, packed bit content and sync counts — whenever the kernel's
capacity flags stay clear (flagged lanes are delegated to host slicing by
any integration, so only unflagged lanes carry a parity contract)."""

import numpy as np
import pytest

from rtl_433_tpu.decoders import Registry
from rtl_433_tpu.ops.slice import SliceCaps, ppm_bounds, slice_ppm
from rtl_433_tpu.pulse import slicers
from rtl_433_tpu.pulse.data import PulseData

RATE = 250_000
CAPS = SliceCaps(events=4, rows=16, row_bytes=20)


def _ppm_devices(k=10):
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.modulation == "OOK_PULSE_PPM"
            and d.decode_fn]
    # modulation-parameter variety: tolerance and no-tolerance specs
    tol = [d for d in devs if d.tolerance > 0][: k // 2]
    notol = [d for d in devs if d.tolerance == 0][: k - len(tol)]
    return tol + notol


def _trains(devs, n_trains, rng):
    """Random trains whose gaps cluster around each spec's windows."""
    out = []
    for i in range(n_trains):
        dev = devs[i % len(devs)]
        n = int(rng.integers(6, 60))
        spu = RATE / 1e6
        cands = [dev.short_width, dev.long_width, dev.sync_width or 0,
                 dev.reset_limit * 1.2, (dev.short_width + dev.long_width)]
        gaps = []
        for _ in range(n):
            g = cands[int(rng.integers(len(cands)))]
            g = g * (1 + rng.uniform(-0.15, 0.15))
            gaps.append(max(1, int(g * spu)))
        pulses = [max(1, int(dev.short_width * spu * 0.5))] * n
        gaps[-1] = int(dev.reset_limit * spu * 1.5) + 10
        out.append((pulses, gaps))
    return out


def _host_events(pulses, gaps, dev):
    pd = PulseData(sample_rate=RATE)
    pd.pulse = list(pulses)
    pd.gap = list(gaps)
    return slicers.slicer_ppm(pd, dev)


def test_ppm_kernel_matches_python():
    rng = np.random.default_rng(31)
    devs = _ppm_devices()
    trains = _trains(devs, 24, rng)
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    bounds = ppm_bounds(devs, RATE)
    out = {k: np.asarray(v) for k, v in
           slice_ppm(pulse, gap, n_pulses, bounds, CAPS).items()}

    checked = skipped = events_seen = 0
    for b, (p, g) in enumerate(trains):
        for s, dev in enumerate(devs):
            if out["ovf"][b, s]:
                skipped += 1
                continue
            want = _host_events(p, g, dev)
            n_ev = int(out["n_events"][b, s])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)} events")
            for e, bb in enumerate(want):
                events_seen += 1
                nr = int(out["num_rows"][b, s, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: rows {nr} != "
                    f"{bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    gb = int(out["bits_per_row"][b, s, e, r])
                    assert gb == wb, (
                        f"train {b} {dev.symbol} ev {e} row {r}: "
                        f"{gb} != {wb} bits")
                    assert int(out["syncs"][b, s, e, r]) == \
                        int(bb.syncs_before_row[r])
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist(), (
                        f"train {b} {dev.symbol} ev {e} row {r} content")
            checked += 1
    assert checked > 100, (checked, skipped)
    assert events_seen > 50


def _pwm_devices(k=10):
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.modulation == "OOK_PULSE_PWM"
            and d.decode_fn]
    tol = [d for d in devs if d.tolerance > 0][: k // 2]
    sync = [d for d in devs if d.tolerance == 0 and d.sync_width > 0][:3]
    plain = [d for d in devs if d.tolerance == 0 and d.sync_width == 0]
    return tol + sync + plain[: k - len(tol) - len(sync)]


def _pwm_trains(devs, n_trains, rng):
    out = []
    for i in range(n_trains):
        dev = devs[i % len(devs)]
        n = int(rng.integers(6, 60))
        spu = RATE / 1e6
        pcands = [dev.short_width, dev.long_width, dev.sync_width or 0,
                  dev.short_width * 0.2, dev.long_width * 2.5]
        gcands = [dev.short_width, dev.gap_limit * 1.2 or dev.short_width,
                  dev.reset_limit * 1.2]
        pulses, gaps = [], []
        for _ in range(n):
            p = pcands[int(rng.integers(len(pcands)))]
            g = gcands[int(rng.integers(len(gcands)))]
            pulses.append(max(1, int(p * (1 + rng.uniform(-0.15, 0.15))
                                     * spu)))
            gaps.append(max(1, int(g * (1 + rng.uniform(-0.15, 0.15))
                                   * spu)))
        gaps[-1] = int(dev.reset_limit * spu * 1.5) + 10
        out.append((pulses, gaps))
    return out


def test_pwm_kernel_matches_python():
    from rtl_433_tpu.ops.slice import pwm_bounds, slice_pwm
    rng = np.random.default_rng(77)
    devs = _pwm_devices()
    trains = _pwm_trains(devs, 24, rng)
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    bounds = pwm_bounds(devs, RATE)
    out = {k: np.asarray(v) for k, v in
           slice_pwm(pulse, gap, n_pulses, bounds, CAPS).items()}

    checked = skipped = 0
    for b, (p, g) in enumerate(trains):
        for s, dev in enumerate(devs):
            if out["ovf"][b, s]:
                skipped += 1
                continue
            pd = PulseData(sample_rate=RATE)
            pd.pulse = list(p)
            pd.gap = list(g)
            want = slicers.slicer_pwm(pd, dev)
            n_ev = int(out["n_events"][b, s])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)}")
            for e, bb in enumerate(want):
                nr = int(out["num_rows"][b, s, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: {nr} != {bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    assert int(out["bits_per_row"][b, s, e, r]) == wb
                    assert int(out["syncs"][b, s, e, r]) == \
                        int(bb.syncs_before_row[r])
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist()
            checked += 1
    assert checked > 100, (checked, skipped)


def _pcm_devices(k=12):
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.decode_fn
            and d.modulation in ("OOK_PULSE_PCM", "FSK_PULSE_PCM",
                                 "OOK_PULSE_RZ")]
    rz = [d for d in devs if d.short_width != d.long_width][: k // 2]
    nrz = [d for d in devs if d.short_width == d.long_width][: k - len(rz)]
    return rz + nrz


def _pcm_trains(devs, n_trains, rng):
    """Bit-period-clustered trains incl. preamble-like runs so the rate
    re-estimation paths (RZ/NRZ preamble + fallbacks) all fire."""
    out = []
    for i in range(n_trains):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        lg = max(1, int(dev.long_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        pulses, gaps = [], []
        # preamble run: exact short pulses at the long period
        n_pre = int(rng.integers(0, 20))
        for _ in range(n_pre):
            pulses.append(s)
            gaps.append(max(1, lg - s))
        n = int(rng.integers(4, 40))
        for _ in range(n):
            k = int(rng.integers(1, 4))
            p = int(s * k * (1 + rng.uniform(-0.1, 0.1)))
            kg = int(rng.integers(1, 5))
            g = int(lg * kg * (1 + rng.uniform(-0.1, 0.1)))
            if rng.uniform() < 0.1:
                g = rst + int(rng.integers(1, rst))       # mid-train EOP
            pulses.append(max(1, p))
            gaps.append(max(1, g))
        gaps[-1] = rst * 2 + 10
        out.append((pulses, gaps))
    return out


def test_pcm_kernel_matches_python():
    from rtl_433_tpu.ops.slice import pcm_bounds, slice_pcm
    rng = np.random.default_rng(123)
    devs = _pcm_devices()
    trains = _pcm_trains(devs, 24, rng)
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    bounds = pcm_bounds(devs, RATE)
    caps = SliceCaps(events=4, rows=16, row_bytes=24)
    out = {k: np.asarray(v) for k, v in
           slice_pcm(pulse, gap, n_pulses, bounds, caps).items()}

    checked = skipped = events_seen = 0
    for b, (p, g) in enumerate(trains):
        for s, dev in enumerate(devs):
            if out["ovf"][b, s]:
                skipped += 1
                continue
            pd = PulseData(sample_rate=RATE)
            pd.pulse = list(p)
            pd.gap = list(g)
            want = slicers.slicer_pcm(pd, dev)
            n_ev = int(out["n_events"][b, s])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)}")
            for e, bb in enumerate(want):
                events_seen += 1
                nr = int(out["num_rows"][b, s, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: rows {nr} != "
                    f"{bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    gb = int(out["bits_per_row"][b, s, e, r])
                    assert gb == wb, (
                        f"train {b} {dev.symbol} ev {e} row {r}: "
                        f"{gb} != {wb} bits")
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist(), (
                        f"train {b} {dev.symbol} ev {e} row {r} content")
            checked += 1
    assert checked > 100, (checked, skipped)
    assert events_seen > 40, events_seen


def _mc_devices(k=10):
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.decode_fn
            and d.modulation in ("OOK_PULSE_MANCHESTER_ZEROBIT",
                                 "FSK_PULSE_MANCHESTER_ZEROBIT")]
    tol = [d for d in devs if d.tolerance > 0][: k // 2]
    notol = [d for d in devs if d.tolerance == 0][: k - len(tol)]
    return tol + notol


def _mc_trains(devs, n_trains, rng):
    out = []
    for i in range(n_trains):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        n = int(rng.integers(6, 60))
        pulses, gaps = [], []
        for _ in range(n):
            kp = [1, 1, 2, 2, 3][int(rng.integers(5))]
            kg = [1, 1, 2, 2, 4][int(rng.integers(5))]
            pulses.append(max(1, int(s * kp * (1 + rng.uniform(-0.2, 0.2)))))
            g = max(1, int(s * kg * (1 + rng.uniform(-0.2, 0.2))))
            if rng.uniform() < 0.06:
                g = rst + int(rng.integers(1, rst))
            gaps.append(g)
        gaps[-1] = rst * 2 + 10
        out.append((pulses, gaps))
    return out


def test_mc_kernel_matches_python():
    from rtl_433_tpu.ops.slice import mc_bounds, slice_mc
    rng = np.random.default_rng(55)
    devs = _mc_devices()
    trains = _mc_trains(devs, 24, rng)
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    bounds = mc_bounds(devs, RATE)
    caps = SliceCaps(events=8, rows=24, row_bytes=20)
    out = {k: np.asarray(v) for k, v in
           slice_mc(pulse, gap, n_pulses, bounds, caps).items()}

    checked = skipped = 0
    for b, (p, g) in enumerate(trains):
        for s, dev in enumerate(devs):
            if out["ovf"][b, s]:
                skipped += 1
                continue
            pd = PulseData(sample_rate=RATE)
            pd.pulse = list(p)
            pd.gap = list(g)
            want = slicers.slicer_manchester_zerobit(pd, dev)
            n_ev = int(out["n_events"][b, s])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)}")
            for e, bb in enumerate(want):
                nr = int(out["num_rows"][b, s, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: {nr} != {bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    assert int(out["bits_per_row"][b, s, e, r]) == wb, (
                        f"train {b} {dev.symbol} ev {e} row {r} bits")
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist(), (
                        f"train {b} {dev.symbol} ev {e} row {r} content")
            checked += 1
    assert checked > 100, (checked, skipped)


def _dmc_devices():
    reg = Registry()
    return [d for d in reg.slots
            if d is not None and d.decode_fn
            and d.modulation == "OOK_PULSE_DMC"]


def test_dmc_kernel_matches_python():
    from rtl_433_tpu.ops.slice import dmc_bounds, slice_dmc
    rng = np.random.default_rng(91)
    devs = _dmc_devices()
    assert devs
    trains = []
    for i in range(30):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        lg = max(1, int(dev.long_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        k = int(rng.integers(6, 60))
        pulses, gaps = [], []
        for _ in range(k):
            pw = [s, s, lg, lg, int(lg * 1.7)][int(rng.integers(5))]
            gw = [s, s, lg, lg, rst + 5][int(rng.integers(5))]
            pulses.append(max(1, int(pw * (1 + rng.uniform(-0.08, 0.08)))))
            gaps.append(max(1, int(gw * (1 + rng.uniform(-0.08, 0.08)))))
        gaps[-1] = rst * 2 + 10
        trains.append((pulses, gaps))
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    bounds = dmc_bounds(devs, RATE)
    caps = SliceCaps(events=6, rows=16, row_bytes=20)
    out = {k: np.asarray(v) for k, v in
           slice_dmc(pulse, gap, n_pulses, bounds, caps).items()}

    checked = skipped = 0
    for b, (p, g) in enumerate(trains):
        for s_i, dev in enumerate(devs):
            if out["ovf"][b, s_i]:
                skipped += 1
                continue
            pd = PulseData(sample_rate=RATE)
            pd.pulse = list(p)
            pd.gap = list(g)
            want = slicers.slicer_dmc(pd, dev)
            n_ev = int(out["n_events"][b, s_i])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)}")
            for e, bb in enumerate(want):
                nr = int(out["num_rows"][b, s_i, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: {nr} != {bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    assert int(out["bits_per_row"][b, s_i, e, r]) == wb, (
                        f"train {b} {dev.symbol} ev {e} row {r} bits")
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s_i, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist(), (
                        f"train {b} {dev.symbol} ev {e} row {r} content")
            checked += 1
    assert checked > 60, (checked, skipped)


def _mod_devices(mod):
    reg = Registry()
    return [d for d in reg.slots
            if d is not None and d.decode_fn and d.modulation == mod]


def _pack(trains):
    N = max(len(p) for p, g in trains)
    B = len(trains)
    pulse = np.zeros((B, N), np.int32)
    gap = np.zeros((B, N), np.int32)
    n_pulses = np.zeros((B,), np.int32)
    for i, (p, g) in enumerate(trains):
        pulse[i, :len(p)] = p
        gap[i, :len(g)] = g
        n_pulses[i] = len(p)
    return pulse, gap, n_pulses


def _check_vs_host(out, trains, devs, host_slicer, min_checked):
    checked = skipped = 0
    for b, (p, g) in enumerate(trains):
        for s_i, dev in enumerate(devs):
            if out["ovf"][b, s_i]:
                skipped += 1
                continue
            pd = PulseData(sample_rate=RATE)
            pd.pulse = list(p)
            pd.gap = list(g)
            want = host_slicer(pd, dev)
            n_ev = int(out["n_events"][b, s_i])
            assert n_ev == len(want), (
                f"train {b} spec {dev.symbol}: {n_ev} != {len(want)}")
            for e, bb in enumerate(want):
                nr = int(out["num_rows"][b, s_i, e])
                assert nr == bb.num_rows, (
                    f"train {b} {dev.symbol} ev {e}: {nr} != {bb.num_rows}")
                for r in range(nr):
                    wb = int(bb.bits_per_row[r])
                    assert int(out["bits_per_row"][b, s_i, e, r]) == wb, (
                        f"train {b} {dev.symbol} ev {e} row {r} bits")
                    nby = (wb + 7) // 8
                    assert out["bytes"][b, s_i, e, r, :nby].tolist() == \
                        bb.bb[r][:nby].tolist(), (
                        f"train {b} {dev.symbol} ev {e} row {r} content")
            checked += 1
    assert checked >= min_checked, (checked, skipped)


def test_piwm_dc_kernel_matches_python():
    from rtl_433_tpu.ops.slice import piwm_dc_bounds, slice_piwm_dc
    rng = np.random.default_rng(101)
    devs = _mod_devices("OOK_PULSE_PIWM_DC")
    assert devs
    trains = []
    for i in range(30):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        lg = max(1, int(dev.long_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        k = int(rng.integers(6, 60))
        pulses, gaps = [], []
        for _ in range(k):
            pw = [s, s, lg, lg, int(lg * 1.7)][int(rng.integers(5))]
            gw = [s, s, lg, lg, rst + 5][int(rng.integers(5))]
            pulses.append(max(1, int(pw * (1 + rng.uniform(-0.1, 0.1)))))
            gaps.append(max(1, int(gw * (1 + rng.uniform(-0.1, 0.1)))))
        if i % 3:  # sub-reset final gap on 1/3: end-of-train flush branch
            gaps[-1] = rst * 2 + 10
        trains.append((pulses, gaps))
    pulse, gap, n_pulses = _pack(trains)
    bounds = piwm_dc_bounds(devs, RATE)
    caps = SliceCaps(events=8, rows=24, row_bytes=20)
    out = {k: np.asarray(v) for k, v in
           slice_piwm_dc(pulse, gap, n_pulses, bounds, caps).items()}
    _check_vs_host(out, trains, devs, slicers.slicer_piwm_dc, 40)


def test_nrzs_kernel_matches_python():
    from rtl_433_tpu.ops.slice import nrzs_bounds, slice_nrzs
    rng = np.random.default_rng(103)
    devs = _mod_devices("OOK_PULSE_NRZS")
    assert devs
    trains = []
    for i in range(24):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        k = int(rng.integers(6, 30))
        pulses, gaps = [], []
        for _ in range(k):
            # exercise the ==limit no-bit branch, sub- and multi-bit runs
            pw = [s, s - 1, s + 1, s * 3, s * 7][int(rng.integers(5))]
            gw = [s, s * 2, rst + 3][int(rng.integers(3))]
            pulses.append(max(1, pw))
            gaps.append(max(1, gw))
        if i % 3:  # sub-reset final gap on 1/3: end-of-train flush
            gaps[-1] = rst + 10
        trains.append((pulses, gaps))
    pulse, gap, n_pulses = _pack(trains)
    bounds = nrzs_bounds(devs, RATE)
    caps = SliceCaps(events=16, rows=16, row_bytes=40)
    out = {k: np.asarray(v) for k, v in
           slice_nrzs(pulse, gap, n_pulses, bounds, caps).items()}
    _check_vs_host(out, trains, devs, slicers.slicer_nrzs, 18)


def test_rzi_kernel_matches_python():
    from rtl_433_tpu.ops.slice import rzi_bounds, slice_rzi
    rng = np.random.default_rng(107)
    devs = _mod_devices("OOK_PULSE_RZI")
    assert devs
    trains = []
    for i in range(24):
        dev = devs[i % len(devs)]
        spu = RATE / 1e6
        s = max(1, int(dev.short_width * spu))
        lg = max(1, int(dev.long_width * spu))
        rst = max(2, int(dev.reset_limit * spu))
        k = int(rng.integers(6, 30))
        pulses, gaps = [], []
        for _ in range(k):
            pw = [s, lg, lg * 2, lg * 3, max(1, s // 2)][int(rng.integers(5))]
            gw = [s, lg, rst + 3][int(rng.integers(3))]
            pulses.append(max(1, int(pw * (1 + rng.uniform(-0.1, 0.1)))))
            gaps.append(max(1, gw))
        if i % 3:  # sub-reset final gap on 1/3: end-of-train flush
            gaps[-1] = rst + 10
        trains.append((pulses, gaps))
    pulse, gap, n_pulses = _pack(trains)
    bounds = rzi_bounds(devs, RATE)
    caps = SliceCaps(events=16, rows=16, row_bytes=40)
    out = {k: np.asarray(v) for k, v in
           slice_rzi(pulse, gap, n_pulses, bounds, caps).items()}
    _check_vs_host(out, trains, devs, slicers.slicer_rzi, 18)


def test_osv1_kernel_matches_python():
    from rtl_433_tpu.ops.slice import osv1_bounds, slice_osv1
    rng = np.random.default_rng(109)
    devs = _mod_devices("OOK_PULSE_PWM_OSV1")
    assert devs
    dev = devs[0]
    spu = RATE / 1e6
    s = max(1, int(dev.short_width * spu))
    rst = max(2, int(dev.reset_limit * spu))
    hmax = s * 3 // 2
    sync = 2 * hmax + 5
    trains = []
    for i in range(30):
        pulses, gaps = [], []
        npre = 12 if i % 4 else int(rng.integers(8, 15))
        for j in range(npre):
            pulses.append(int(s * (1 + rng.uniform(-0.2, 0.2))))
            g = int(s * (1 + rng.uniform(-0.2, 0.2)))
            gaps.append(min(g, hmax) if j < npre - 1 else hmax + 3)
        if i % 5 == 3:  # corrupt preamble pulse (abort path)
            pulses[int(rng.integers(npre))] = max(1, s // 4)
        pulses.append(sync + int(rng.integers(0, 20)))
        gaps.append(sync + int(rng.integers(0, 20))
                    if i % 7 else max(1, s))  # occasional bad sync gap
        k = int(rng.integers(8, 40))
        for _ in range(k):
            pulses.append([s, 2 * s][int(rng.integers(2))])
            gaps.append([s, 2 * s][int(rng.integers(2))])
        if i % 3:  # sub-reset final gap on 1/3: end-of-train flush
            gaps[-1] = rst + 10
        trains.append((pulses, gaps))
    pulse, gap, n_pulses = _pack(trains)
    bounds = osv1_bounds(devs, RATE)
    caps = SliceCaps(events=4, rows=16, row_bytes=40)
    out = {k: np.asarray(v) for k, v in
           slice_osv1(pulse, gap, n_pulses, bounds, caps).items()}
    _check_vs_host(out, trains, devs, slicers.slicer_osv1, 25)
