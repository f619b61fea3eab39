"""Multi-device sharding tests: the sharded engine must produce results
identical to the single-device engine (SURVEY.md §4.5 — distributed testing
created from scratch: cross-shard equivalence vs. single-host ground truth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtl_433_tpu.dsp.engine import (DetectorParams, detector_init,
                                    process_block, take_packages)
from rtl_433_tpu.parallel import make_mesh
from rtl_433_tpu.parallel.sharding import ShardedEngine, sharded_init

from synth import pwm_pulses, synth_ook


def _params():
    return DetectorParams(sample_rate=250_000, pkg_cap=4)


def _mk_blocks(channels, n, seed=7):
    """Per-channel CU8 blocks, some with a real OOK burst."""
    rng = np.random.default_rng(seed)
    iq = rng.integers(123, 133, size=(channels, n, 2), dtype=np.uint8)
    sig = synth_ook(pwm_pulses([1, 0, 1, 1, 0, 0, 1, 0] * 3))
    for c in range(0, channels, 2):
        off = 500 + 37 * c
        seg = sig[: max(0, n - off)]
        iq[c, off:off + seg.shape[0]] = seg
    return iq


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    mesh2 = make_mesh(8, axes=("host", "ch"))
    assert mesh2.devices.size == 8


def test_sharded_equals_single():
    params = _params()
    channels, n = 8, 2048
    iq = _mk_blocks(channels, n)

    # ground truth: single-device
    state = detector_init(params, channels)
    state, _ = process_block(params, state, jnp.asarray(iq), n, flush=True)
    ref_pkgs, _ = take_packages(state)

    # sharded over the full 8-device mesh
    mesh = make_mesh(8)
    eng = ShardedEngine(params, channels, mesh)
    eng.push(iq, flush=True)
    got_pkgs, _ = take_packages(jax.device_get(eng.state))

    assert len(ref_pkgs) == len(got_pkgs)
    for a, b in zip(ref_pkgs, got_pkgs):
        assert a["channel"] == b["channel"]
        assert a["type"] == b["type"]
        assert a["num_pulses"] == b["num_pulses"]
        np.testing.assert_array_equal(a["pulse"], b["pulse"])
        np.testing.assert_array_equal(a["gap"], b["gap"])


def test_sharded_2d_mesh():
    params = _params()
    mesh = make_mesh(8, axes=("host", "ch"))
    eng = ShardedEngine(params, 16, mesh)
    iq = _mk_blocks(16, 1024, seed=3)
    avg_db = eng.push(iq)
    assert avg_db.shape == (16,)
    assert np.isfinite(float(eng.noise_floor_db))


def _nexus_iq(n, seed=0):
    """A decodable Nexus-TH PPM burst (id 156, ch 1, 21.5C, 45%)."""
    from synth import ppm_pulses
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


def test_sharded_event_service_matches_per_channel():
    """drain_events == N independent single-channel runs, channel-tagged
    (VERDICT r1 item 4: event-level equality on the sharded path)."""
    from rtl_433_tpu.decoders import Registry
    from rtl_433_tpu.output.data_model import event_to_json

    params = _params()
    channels, n = 8, 98304
    iq = np.zeros((channels, n, 2), np.uint8) + 128
    rng = np.random.default_rng(11)
    for c in range(channels):
        if c % 2 == 0:
            iq[c] = _nexus_iq(n, seed=c)
        else:
            iq[c] = rng.integers(123, 133, size=(n, 2), dtype=np.uint8)

    mesh = make_mesh(8)
    eng = ShardedEngine(params, channels, mesh, registry=Registry())
    eng.registry.register_all()
    eng.push(iq, flush=True)
    got = [(c, event_to_json(ev)) for c, ev in eng.drain_events()]

    want = []
    for c in range(channels):
        r = Registry()
        r.register_all()
        e1 = ShardedEngine(params, 1, make_mesh(1), registry=r)
        e1.push(iq[c:c + 1], flush=True)
        want += [(c, event_to_json(ev)) for _, ev in e1.drain_events()]

    assert sorted(got) == sorted(want)
    assert any("Nexus" in e for _, e in got)


def test_channels_must_divide():
    params = _params()
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        sharded_init(params, 12, mesh)
