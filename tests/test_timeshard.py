"""Time-axis (sp) sharding: split invariance + fallback correctness.

The SURVEY §2 "sequence parallelism" contract: the same sample stream,
split across N mesh devices along time, must produce a pulse train
bit-identical to the sequential engine — boundary carries exchanged via
``ppermute`` (overlap-save halos), speculation verified on-device
(parallel/timeshard.py).  Runs on the virtual 8-device CPU mesh.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rtl_433_tpu.dsp import DetectorParams, detector_init, process_block
from rtl_433_tpu.dsp.engine import take_packages
from rtl_433_tpu.parallel.timeshard import (TimeShardEngine,
                                            timeshard_process_block)

from synth import synth_ook, synth_fsk, pwm_pulses, ppm_pulses, fsk_pcm_bits

PWM_SIG = lambda: synth_ook(
    pwm_pulses("110010101001", short_us=264, long_us=744, gap_short_us=744,
               gap_long_us=264, reset_us=12000, repeats=3),
    rate=250_000, lead_in_us=20_000, tail_us=120_000)

FSK_SIG = lambda: synth_fsk(
    fsk_pcm_bits("1100101011110000" * 4, bit_us=100),
    rate=250_000, lead_in_us=16_000, tail_us=120_000, seed=7)


def _dense_sig(seed=11):
    """Several PPM packages spread through the stream so that packages
    complete on different time shards within one block."""
    train = []
    for rep in range(6):
        train += ppm_pulses("10110010", pulse_us=500, gap_zero_us=1000,
                            gap_one_us=2000, reset_us=6000, repeats=2)
        train += [(0, 14_000)]
    return synth_ook(train, rate=250_000, lead_in_us=20_000,
                     tail_us=60_000, seed=seed)


def run_sequential(iq, params, flush=True):
    state = detector_init(params, 1)
    pb = jax.jit(functools.partial(process_block, params),
                 static_argnames=("flush",))
    n = iq.shape[0]
    pad = (-n) % (params.chunk * 8)
    blk = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    state, _ = pb(state, jnp.asarray(blk), jnp.int32(n), flush=flush)
    pkgs, state = take_packages(state)
    return pkgs


def run_timeshard(iq, params, n_devices, halo_chunks=10, flush=True):
    """Speculative path only — returns (pkgs, ok); pkgs are only
    meaningful when ok (the engine wrapper otherwise falls back)."""
    devs = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devs, ("sp",))
    fn = timeshard_process_block(params, mesh, halo_chunks=halo_chunks,
                                 flush=flush)
    state = detector_init(params, 1)
    n = iq.shape[0]
    pad = (-n) % (params.chunk * max(8, n_devices))
    blk = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    state, _, ok = fn(state, jnp.asarray(blk), jnp.int32(n))
    pkgs, state = take_packages(state)
    return pkgs, bool(np.asarray(ok))


def run_engine_wrapper(iq, params, n_devices, halo_chunks=10):
    """The production path: speculate, verify, fall back when needed —
    always bit-identical by construction. Returns (pkgs, fallbacks)."""
    devs = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devs, ("sp",))
    eng = TimeShardEngine(params, channels=1, mesh=mesh,
                          halo_chunks=halo_chunks)
    n = iq.shape[0]
    pad = (-n) % (params.chunk * max(8, n_devices))
    blk = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    eng.push(blk, n_valid=n, flush=True)
    return eng.take_packages(), eng.fallbacks


def assert_pkgs_equal(a, b):
    assert len(a) == len(b), (len(a), len(b))
    for x, y in zip(a, b):
        for f in ("type", "num_pulses", "start", "end",
                  "ook_low_estimate", "ook_high_estimate",
                  "fsk_f1_est", "fsk_f2_est"):
            assert x[f] == y[f], (f, x[f], y[f])
        assert x["pulse"].tolist() == y["pulse"].tolist()
        assert x["gap"].tolist() == y["gap"].tolist()


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_split_invariance_pwm(n_devices):
    """Same stream, N time-splits => identical packages, whether the
    speculation verifies or the wrapper falls back."""
    iq = PWM_SIG()
    params = DetectorParams()
    whole = run_sequential(iq, params)
    assert whole, "no packages detected"
    split, _ = run_engine_wrapper(iq, params, n_devices)
    assert_pkgs_equal(split, whole)


@pytest.mark.parametrize("n_devices", [4, 8])
def test_split_invariance_fsk(n_devices):
    iq = FSK_SIG()
    params = DetectorParams(fsk_minmax=False)
    whole = run_sequential(iq, params)
    assert any(p["type"] == 2 for p in whole), "no FSK package"
    split, _ = run_engine_wrapper(iq, params, n_devices)
    assert_pkgs_equal(split, whole)


def _shard_local_sig():
    """One package per 16384-sample region (the 8-way shard size), placed
    just after each region start so every shard boundary sits in silence:
    the speculative fast path must verify AND every shard publishes its own
    package (exercises the cross-device gen re-basing of record keys)."""
    region_us = 16384 * 4          # 65.536 ms per region at 250 kS/s
    lead_us = 20_000
    train, t = [], lead_us
    for k in range(8):
        target = k * region_us + 24_000
        filler = target - t
        assert filler >= 0
        train.append((0, filler))
        pk = ppm_pulses("10110010", pulse_us=500, gap_zero_us=1000,
                        gap_one_us=2000, reset_us=6000, repeats=1)
        train += pk
        t = target + sum(p + g for p, g in pk)
    return synth_ook(train, rate=250_000, lead_in_us=lead_us,
                     tail_us=40_000, seed=17)


def test_split_invariance_dense_multi_package():
    """Packages completing on several different shards of one block: the
    gen re-basing must line record keys up across device logs."""
    iq = _shard_local_sig()
    params = DetectorParams()
    whole = run_sequential(iq, params)
    assert len(whole) >= 6, f"want a multi-package block, got {len(whole)}"
    split, ok = run_timeshard(iq, params, 8)
    # the whole point: the fast path must actually verify on a stream
    # whose packages are confined to single shards with quiet halos
    assert ok, "speculation unexpectedly failed on shard-local packages"
    assert_pkgs_equal(split, whole)


def test_fallback_is_bit_identical():
    """A package longer than the halo straddling a shard boundary must
    fail verification — and the engine wrapper must then produce the
    sequential result anyway."""
    params = DetectorParams()
    # one very long OOK package: pulses with short gaps, total ~ 80 ms
    # (~20k samples), far longer than halo = 2 chunks = 256 samples
    train = []
    for _ in range(200):
        train += [(400, 400)]
    train += [(0, 30_000)]
    iq = synth_ook(train, rate=250_000, lead_in_us=20_000, tail_us=60_000,
                   seed=5)
    whole = run_sequential(iq, params)
    assert whole and max(p["num_pulses"] for p in whole) >= 100
    split, ok = run_timeshard(iq, params, 8, halo_chunks=2)
    assert not ok, "a boundary-straddling package must fail verification"

    # the TimeShardEngine replays the block sequentially on failure
    eng = TimeShardEngine(params, channels=1, halo_chunks=2)
    n = iq.shape[0]
    pad = (-n) % (params.chunk * 8)
    blk = np.pad(iq, ((0, pad), (0, 0)), constant_values=128)[None]
    eng.push(blk, n_valid=n, flush=True)
    got = eng.take_packages()
    assert eng.fallbacks == 1
    assert len(got) == len(whole)
    for x, y in zip(got, whole):
        assert x["pulse"].tolist() == y["pulse"].tolist()
        assert x["gap"].tolist() == y["gap"].tolist()


def test_streaming_blocks_match_sequential():
    """Multi-block streaming through TimeShardEngine: cross-block carries
    (open packages, IIR/FM state) survive the sharded path."""
    params = DetectorParams()
    iq = _dense_sig(seed=23)
    # sequential reference over the same 3-block split
    whole = run_sequential(iq, params)

    eng = TimeShardEngine(params, channels=1)
    n = iq.shape[0]
    blk_len = ((n // 3) // (params.chunk * 8) + 1) * (params.chunk * 8)
    got = []
    off = 0
    while off < n:
        end = min(off + blk_len, n)
        blk = iq[off:end]
        pad = (-blk.shape[0]) % blk_len
        blkp = np.pad(blk, ((0, pad), (0, 0)), constant_values=128)[None]
        eng.push(blkp, n_valid=end - off, flush=end >= n)
        got.extend(eng.take_packages())
        off = end
    assert len(got) == len(whole)
    for x, y in zip(got, whole):
        assert x["pulse"].tolist() == y["pulse"].tolist()
        assert x["gap"].tolist() == y["gap"].tolist()
