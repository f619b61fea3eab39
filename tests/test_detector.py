"""Engine vs sequential-oracle parity tests for the pulse detector.

The oracle (tests/fsm_oracle.py) is a faithful behavioral model of the
reference C detector; tests/test_reference_parity.py closes the loop against
the actual rtl_433 binary. Here we check the vectorized JAX engine against
the oracle on synthetic OOK/FSK signals, across block splits and channels.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtl_433_tpu.dsp import DetectorParams, detector_init, process_block
from rtl_433_tpu.dsp.engine import take_packages

from fsm_oracle import Oracle, am_fm_streams
from synth import synth_ook, synth_fsk, pwm_pulses, ppm_pulses, fsk_pcm_bits


def run_engine(iq, params, block_len=None):
    """Run the engine over iq [N,2]; returns packages list."""
    N = iq.shape[0]
    blocks = [iq] if block_len is None else [
        iq[i:i + block_len] for i in range(0, N, block_len)]
    state = detector_init(params, 1)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    pkgs = []
    for bi, blk in enumerate(blocks):
        n = blk.shape[0]
        pad = (-n) % params.chunk
        blkp = np.pad(blk, ((0, pad), (0, 0)), constant_values=128)[None]
        state, _ = pb(state, jnp.asarray(blkp), jnp.int32(n),
                      flush=(bi == len(blocks) - 1))
        got, state = take_packages(state)
        pkgs.extend(got)
    return pkgs


def run_oracle(iq, params):
    am, fm = am_fm_streams(iq, params.sample_rate, params.fsk_minmax,
                           params.use_mag_est)
    if not params.enable_fm:
        fm = np.zeros_like(fm)
    o = Oracle(sample_rate=params.sample_rate, minmax=params.fsk_minmax,
               min_high_level=params.ook_min_high_level,
               high_low_ratio=params.ook_high_low_ratio)
    pkgs = o.detect(am.tolist(), fm.tolist())
    pkgs += o.detect([], [])
    return pkgs


def assert_match(engine_pkgs, oracle_pkgs, check_meta=True):
    assert len(engine_pkgs) == len(oracle_pkgs), (
        f"package count {len(engine_pkgs)} != {len(oracle_pkgs)}")
    for e, (typ, o) in zip(engine_pkgs, oracle_pkgs):
        assert e["type"] == (2 if typ == "FSK" else 1), (typ, e["type"])
        assert e["num_pulses"] == o["num"], (e["num_pulses"], o["num"])
        n = o["num"]
        assert e["pulse"].tolist() == o["pulse"][:n], (
            e["pulse"].tolist(), o["pulse"][:n])
        assert e["gap"].tolist() == o["gap"][:n], (
            e["gap"].tolist(), o["gap"][:n])
        if check_meta:
            assert e["ook_low_estimate"] == o["low"]
            assert e["ook_high_estimate"] == o["high"]
            assert e["fsk_f1_est"] == o["f1"]
            assert e["fsk_f2_est"] == o["f2"]


PWM_SIG = lambda: synth_ook(
    pwm_pulses("110010101001", short_us=264, long_us=744, gap_short_us=744,
               gap_long_us=264, reset_us=12000, repeats=3),
    rate=250_000, lead_in_us=20_000, tail_us=120_000)

PPM_SIG = lambda: synth_ook(
    ppm_pulses("10110010", pulse_us=500, gap_zero_us=1000, gap_one_us=2000,
               reset_us=6000, repeats=2),
    rate=250_000, lead_in_us=20_000, tail_us=120_000, seed=3)

FSK_SIG = lambda: synth_fsk(
    fsk_pcm_bits("1100101011110000" * 4, bit_us=100),
    rate=250_000, lead_in_us=16_000, tail_us=120_000, seed=7)


def test_pwm_matches_oracle():
    iq = PWM_SIG()
    params = DetectorParams()
    assert_match(run_engine(iq, params), run_oracle(iq, params))


def test_ppm_matches_oracle():
    iq = PPM_SIG()
    params = DetectorParams()
    assert_match(run_engine(iq, params), run_oracle(iq, params))


def test_fsk_classic_matches_oracle():
    iq = FSK_SIG()
    params = DetectorParams(fsk_minmax=False)
    e, o = run_engine(iq, params), run_oracle(iq, params)
    assert any(p["type"] == 2 for p in e), "no FSK package detected"
    assert_match(e, o)


def test_fsk_minmax_matches_oracle():
    iq = FSK_SIG()
    params = DetectorParams(fsk_minmax=True)
    e, o = run_engine(iq, params), run_oracle(iq, params)
    assert any(p["type"] == 2 for p in e), "no FSK package detected"
    assert_match(e, o)


def test_block_split_invariance():
    """Same stream split at different block boundaries => identical packages
    (the SURVEY section 4.5 boundary-equivalence battery)."""
    iq = PWM_SIG()
    params = DetectorParams()
    whole = run_engine(iq, params)
    for blk in (4096, 10_000, 13_337):
        split = run_engine(iq, params, block_len=blk)
        assert len(split) == len(whole)
        for a, b in zip(split, whole):
            assert a["pulse"].tolist() == b["pulse"].tolist()
            assert a["gap"].tolist() == b["gap"].tolist()
            assert a["ook_low_estimate"] == b["ook_low_estimate"]


def test_multichannel_independence():
    """Channels are independent: batching shifted copies must reproduce the
    single-channel result per channel."""
    iq = PWM_SIG()
    params = DetectorParams()
    single = run_engine(iq, params)

    N = iq.shape[0]
    pad = (-N) % params.chunk
    C = 4
    batch = np.tile(np.pad(iq, ((0, pad), (0, 0)), constant_values=128),
                    (C, 1, 1))
    state = detector_init(params, C)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    state, _ = pb(state, jnp.asarray(batch), jnp.int32(N), flush=True)
    pkgs, _ = take_packages(state)
    assert len(pkgs) == C * len(single)
    per_chan = {}
    for p in pkgs:
        per_chan.setdefault(p["channel"], []).append(p)
    for c in range(C):
        for a, b in zip(per_chan[c], single):
            assert a["pulse"].tolist() == b["pulse"].tolist()
            assert a["gap"].tolist() == b["gap"].tolist()


def test_empty_signal_no_packages():
    iq = np.full((8192, 2), 128, np.uint8)
    params = DetectorParams()
    assert run_engine(iq, params) == []


def _rewind_sig():
    """FSK frame with a spurious 32us (8-sample) mark early in a 2000us
    space: the classic tracker commits the pair, then rewinds
    (ref src/pulse_detect_fsk.c:81-89) and re-commits the SAME record index
    ~500 samples (= 4 chunk boundaries at chunk=128) later with the merged
    558-sample gap. Regression for the block-log dedup: duplicates must be
    resolved after validity compaction — a raw-log lookahead misses
    recommits that cross chunk boundaries, leaving two records scattering
    to one slot under a unique_indices promise (undefined on TPU)."""
    segs = []
    for _ in range(10):
        segs += [(200, True), (200, False)]
    segs += [(200, True), (200, False), (32, True), (2000, False)]
    for _ in range(10):
        segs += [(200, True), (200, False)]
    return synth_fsk(segs, rate=250_000, lead_in_us=16_000, tail_us=120_000,
                     seed=11)


def test_fsk_rewind_recommit_across_chunks():
    iq = _rewind_sig()
    params = DetectorParams(fsk_minmax=False)
    e, o = run_engine(iq, params), run_oracle(iq, params)
    assert any(p["type"] == 2 for p in e), "no FSK package detected"
    # the recommitted (merged) gap must be published, not the stale value
    assert any(558 in p["gap"].tolist() for p in e), \
        "rewound gap not re-committed"
    assert_match(e, o)


def test_fsk_rewind_recommit_across_blocks():
    """Split so the rewind's recommit lands in a different BLOCK than the
    original commit: the stale record publishes via the carry prefill and
    the recommit must overwrite it through the publish scatter."""
    iq = _rewind_sig()
    params = DetectorParams(fsk_minmax=False)
    whole = run_engine(iq, params)
    for blk in (4352, 4608, 6144):  # boundaries inside the 2000us gap
        split = run_engine(iq, params, block_len=blk)
        assert len(split) == len(whole)
        for a, b in zip(split, whole):
            assert a["pulse"].tolist() == b["pulse"].tolist()
            assert a["gap"].tolist() == b["gap"].tolist()


def test_wide_drain_interval_invariance():
    """chunk=512/ring=64/eops=4 (the TPU drain tuning) must produce
    bit-identical packages to the default chunk=128 configuration."""
    iq = np.concatenate([PWM_SIG(), FSK_SIG(), PPM_SIG()])
    base = DetectorParams(sample_rate=250_000, pkg_cap=8)
    wide = DetectorParams(sample_rate=250_000, pkg_cap=8,
                          chunk=512, ring=64, eops=4)
    a = run_engine(iq, base)
    b = run_engine(iq, wide)
    assert len(a) == len(b) and len(a) >= 3
    for x, y in zip(a, b):
        assert x["type"] == y["type"]
        assert x["num_pulses"] == y["num_pulses"]
        assert x["pulse"].tolist() == y["pulse"].tolist()
        assert x["gap"].tolist() == y["gap"].tolist()
        assert x["ook_low_estimate"] == y["ook_low_estimate"]


def test_arena_size_invariance():
    """The publish arena size only bounds capacity (overflow is counted) —
    any size that holds the block's records must produce bit-identical
    packages, including FSK-rewind recommits and cross-block carries."""
    for sig_fn, fsk in ((PWM_SIG, False), (FSK_SIG, False), (_rewind_sig, False)):
        iq = sig_fn()
        base = DetectorParams(fsk_minmax=fsk)
        flat = DetectorParams(fsk_minmax=fsk, arena=1024)
        for blk in (None, 10_000):
            a = run_engine(iq, base, block_len=blk)
            b = run_engine(iq, flat, block_len=blk)
            assert len(a) == len(b)
            for x, y in zip(a, b):
                assert x["pulse"].tolist() == y["pulse"].tolist()
                assert x["gap"].tolist() == y["gap"].tolist()
                assert x["ook_low_estimate"] == y["ook_low_estimate"]
                assert x["start"] == y["start"] and x["end"] == y["end"]


def test_group_cap_exact_fallback_never_drops():
    """A channel with more non-empty chunk-groups than `chan_groups` must
    lose NOTHING: the capped MXU fast drain is guarded by a lax.cond that
    routes such blocks through the exact drain (round-4 regression: the
    cap silently dropped records on single-channel file replay)."""
    iq = np.concatenate([PWM_SIG(), PPM_SIG(), PWM_SIG()])
    base = DetectorParams()
    # chan_groups=2 forces the exact path on every record-bearing block
    capped = DetectorParams(chan_groups=2)
    for blk in (None, 10_000):
        a = run_engine(iq, base, block_len=blk)
        b = run_engine(iq, capped, block_len=blk)
        assert len(a) == len(b) and len(a) >= 6
        for x, y in zip(a, b):
            assert x["pulse"].tolist() == y["pulse"].tolist()
            assert x["gap"].tolist() == y["gap"].tolist()
            assert x["start"] == y["start"] and x["end"] == y["end"]
    # and the oracle agrees end-to-end
    assert_match(run_engine(iq, capped), run_oracle(iq, base))


def test_group_cap_overflow_counter_stays_zero():
    """With the exact fallback, the cap must not count (or cause) ring
    overflow: n_ring_ovf stays 0 even when chan_groups is exceeded."""
    iq = PWM_SIG()
    params = DetectorParams(chan_groups=1)
    N = iq.shape[0]
    pad = (-N) % params.chunk
    blkp = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    state = detector_init(params, 1)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    state, _ = pb(state, jnp.asarray(blkp), jnp.int32(N), flush=True)
    assert int(np.asarray(state["n_ring_ovf"]).sum()) == 0
    assert int(np.asarray(state["n_pkg_drop"]).sum()) == 0


def test_compact_packages_matches_take_packages():
    """Device-side package compaction must reproduce take_packages exactly
    (same order, same payloads) — it is the bench/live transfer format."""
    from rtl_433_tpu.dsp.engine import compact_packages, packages_from_compact

    iq = PWM_SIG()
    params = DetectorParams()
    N = iq.shape[0]
    pad = (-N) % params.chunk
    one = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)
    # 3 channels: signal, noise-free idle, signal shifted
    blk = np.stack([one, np.full_like(one, 128),
                    np.roll(one, 1024, axis=0)])
    state = detector_init(params, 3)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    state, _ = pb(state, jnp.asarray(blk), jnp.int32(N), flush=True)
    comp = jax.jit(functools.partial(compact_packages, cap=16))(state)
    via_compact, count = packages_from_compact(
        {k: np.asarray(v) for k, v in comp.items()})
    via_take, _state = take_packages(state)
    assert count == len(via_take) and len(via_compact) == len(via_take)
    for a, b in zip(via_compact, via_take):
        assert a["channel"] == b["channel"]
        assert a["type"] == b["type"]
        assert a["num_pulses"] == b["num_pulses"]
        assert a["pulse"].tolist() == b["pulse"].tolist()
        assert a["gap"].tolist() == b["gap"].tolist()
        for k in ("ook_low_estimate", "ook_high_estimate", "fsk_f1_est",
                  "fsk_f2_est", "start", "end"):
            assert a[k] == b[k], k
