"""Native ingest library tests: conversions vs numpy, ring buffer, and
differential checks against the JAX baseband kernels."""

import numpy as np
import pytest

from rtl_433_tpu.io import native


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def test_native_available():
    assert native.available(), "native library should build in this env"


def test_cs8_to_cu8(rng):
    src = rng.integers(-128, 128, size=4096, dtype=np.int8)
    out = native.cs8_to_cu8(src)
    ref = (src.astype(np.int16) + 128).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_cf32_to_cs16(rng):
    src = rng.uniform(-1.5, 1.5, size=4096).astype(np.float32)
    out = native.cf32_to_cs16(src)
    s = (src * 32767.0).astype(np.int64)
    ref = np.clip(s, -32767, 32767).astype(np.int16)
    np.testing.assert_array_equal(out, ref)


def test_envelope_matches_jax(rng):
    import jax.numpy as jnp
    from rtl_433_tpu.dsp import baseband

    iq = rng.integers(0, 256, size=(1, 512, 2), dtype=np.uint8)
    env_jax, _ = baseband.envelope_detect_cu8(jnp.asarray(iq))
    env_native = native.envelope_cu8(iq.reshape(-1))
    np.testing.assert_array_equal(np.asarray(env_jax)[0].astype(np.uint16),
                                  env_native)


def test_magnitude_matches_jax(rng):
    import jax.numpy as jnp
    from rtl_433_tpu.dsp import baseband

    iq = rng.integers(0, 256, size=(1, 512, 2), dtype=np.uint8)
    mag_jax, _ = baseband.magnitude_est_cu8(jnp.asarray(iq))
    mag_native = native.magnitude_est_cu8(iq.reshape(-1))
    np.testing.assert_array_equal(np.asarray(mag_jax)[0].astype(np.uint16),
                                  mag_native)


def test_block_ring(rng):
    ring = native.BlockRing(1024, n_blocks=4)
    blocks = [rng.integers(0, 256, size=1024, dtype=np.uint8)
              for _ in range(6)]
    pushed = [ring.push(b) for b in blocks]
    assert pushed == [True] * 4 + [False] * 2
    assert ring.fill == 4
    assert ring.dropped == 2
    for i in range(4):
        np.testing.assert_array_equal(ring.pop(), blocks[i])
    assert ring.pop() is None


def test_block_ring_threaded(rng):
    import threading
    ring = native.BlockRing(256, n_blocks=8)
    n = 200
    blocks = [np.full(256, i % 251, dtype=np.uint8) for i in range(n)]
    got = []

    def producer():
        for b in blocks:
            while not ring.push(b):
                pass

    t = threading.Thread(target=producer)
    t.start()
    while len(got) < n:
        out = ring.pop()
        if out is not None:
            got.append(out)
    t.join()
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, blocks[i])
