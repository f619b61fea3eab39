"""Benchmark: aggregate IQ throughput of the fused pulse-detection engine.

Measures MS/s (million complex IQ samples per second) through the full
device pipeline — AM estimation, AM low-pass IIR, FM discriminator+IIR,
OOK hysteresis FSM, FSK tracker, package publish — over a multi-channel
CU8 block stream on one chip.

Baseline: the reference rtl_433 C binary (single core, this machine class)
measures ~57.7 MS/s over the same workload (noise blocks, all default
protocols registered, `-F null`; see BASELINE.md measurement protocol).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference single-core throughput measured with:
#   rtl_433 -r /tmp/bench_noise_250k.cu8 -F null   (32M samples, best of 3)
BASELINE_MSPS = 57.7


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtl_433_tpu.api import _enable_compile_cache
    from rtl_433_tpu.dsp.engine import DetectorParams, detector_init

    _enable_compile_cache()

    on_tpu = jax.default_backend() != "cpu"
    channels = int(os.environ.get("BENCH_CHANNELS", "8192" if on_tpu else "32"))
    n = int(os.environ.get("BENCH_BLOCK", "131072" if on_tpu else "16384"))
    reps = int(os.environ.get("BENCH_REPS", "4"))

    params = DetectorParams(sample_rate=250_000, unroll=16 if on_tpu else 1,
                            pallas_frontend=on_tpu)

    from rtl_433_tpu.dsp.engine import process_block
    import functools
    step = jax.jit(functools.partial(process_block, params),
                   static_argnames=("flush",), donate_argnums=(0,))

    state = detector_init(params, channels)
    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.integers(123, 133, size=(channels, n, 2),
                                  dtype=np.uint8))

    # warmup / compile
    state, avg = step(state, iq, flush=False)
    np.asarray(avg)  # hard sync: device->host transfer

    t0 = time.perf_counter()
    for _ in range(reps):
        state, avg = step(state, iq, flush=False)
    # hard sync via host transfer — on the tunneled backend
    # block_until_ready() returns before execution completes
    np.asarray(state["num"])
    dt = time.perf_counter() - t0

    msps = channels * n * reps / dt / 1e6
    print(json.dumps({
        "metric": "engine_throughput",
        "value": round(msps, 1),
        "unit": "MS/s/chip",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))


if __name__ == "__main__":
    main()
