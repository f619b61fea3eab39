#!/usr/bin/env python
"""Front-end kernel roofline: achieved HBM traffic vs the chip's peak.

Measures the fused Pallas front-end (magnitude/envelope + AM low-pass +
FM discriminator + FM low-pass, ops/frontend.py) and the full detector
step, and reports bytes-moved / second against the per-chip HBM peak
(BASELINE.json "kernels at per-chip roofline"; VERDICT r3 item 5).

Traffic model per [C, N] cu8 block:
  frontend: read iq (2*C*N u8) + write am,fm (2*C*N i16 each) = 6*C*N B
  detector: frontend + FSM scan re-reads am,fm (4*C*N) and writes the
            record/EOP logs (~C*N/chunk*(3*ring+eops*9)*4 B)

Run on the TPU: python tools/bench_roofline.py
Each timed iteration syncs via a device_get of a dependent scalar (the
axon tunnel's block_until_ready is unreliable for timing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# v5e (lite) per-chip HBM peak; override for other chips
HBM_PEAK_GBS = float(os.environ.get("ROOFLINE_HBM_GBS", "819"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rtl_433_tpu.api import _enable_compile_cache
    from rtl_433_tpu.dsp.engine import (DetectorParams, detector_init,
                                        process_block)
    from rtl_433_tpu.ops.frontend import frontend

    _enable_compile_cache()
    on_tpu = jax.default_backend() != "cpu"
    C = int(os.environ.get("ROOFLINE_CHANNELS", "4096" if on_tpu else "32"))
    N = int(os.environ.get("ROOFLINE_BLOCK", "131072" if on_tpu else "32768"))
    params = DetectorParams(sample_rate=250_000, fsk_minmax=False,
                            enable_fm=True, unroll=16 if on_tpu else 1,
                            chunk=128, ring=8, eops=2, arena=65536,
                            pallas_frontend=on_tpu)
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(110, 150, size=(C, N, 2),
                                     dtype=np.uint8))

    def fe_fn(state, iq):
        am, phi, state, avg = frontend(
            iq, state, sample_rate=params.sample_rate,
            use_mag_est=params.use_mag_est, enable_fm=True,
            fm_low_pass=params.fm_low_pass, fsk_minmax=False,
            n_valid=None, time_major=True)
        # fold outputs into a scalar so fetching it forces the kernel
        return state, am[::997, ::997].astype(jnp.int32).sum() + \
            phi[::997, ::997].astype(jnp.int32).sum()

    def det_fn(state, iq):
        state, avg = process_block(params, state, iq, None, flush=False)
        return state, avg.sum()

    rows = []
    for tag, fn, traffic in (
            ("pallas_frontend", fe_fn, 6 * C * N),
            ("detector_step", det_fn,
             10 * C * N + (N // params.chunk) * C
             * (3 * params.ring + params.eops * 9) * 4)):
        jfn = jax.jit(fn)
        st = detector_init(params, C)
        st, out = jfn(st, iq)
        _ = jax.device_get(out)
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            st, out = jfn(st, iq)
            _ = jax.device_get(out)
        dt = (time.perf_counter() - t0) / reps
        gbs = traffic / dt / 1e9
        rows.append({"kernel": tag, "ms_per_block": round(dt * 1e3, 1),
                     "msps": round(C * N / dt / 1e6, 1),
                     "bytes_per_block": traffic,
                     "achieved_GBs": round(gbs, 1),
                     "pct_of_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"hbm_peak_GBs": HBM_PEAK_GBS, "rows": rows}))


if __name__ == "__main__":
    main()
