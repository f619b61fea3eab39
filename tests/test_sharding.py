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


def test_channels_must_divide():
    params = _params()
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        sharded_init(params, 12, mesh)
