"""Worker process for the 2-process DCN test (tests/test_multihost.py).

Usage: multihost_worker.py <coordinator> <nproc> <pid> <outfile>
Each process owns 4 virtual CPU devices and 4 channels; the global mesh is
2 hosts x 4 devices. Decoded (channel, event-json) pairs for the LOCAL
channels are written to <outfile>.
"""

import json
import os
import sys

coordinator, nproc, pid, outfile = sys.argv[1:5]
nproc, pid = int(nproc), int(pid)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rtl_433_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator, nproc, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == nproc * 4

import numpy as np  # noqa: E402

from rtl_433_tpu.decoders import Registry  # noqa: E402
from rtl_433_tpu.dsp.engine import DetectorParams  # noqa: E402
from rtl_433_tpu.output.data_model import event_to_json  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from multihost_fixture import make_local_iq  # noqa: E402

params = DetectorParams(sample_rate=250_000, pkg_cap=4)
reg = Registry()
reg.register_all()
eng = multihost.MultiHostEngine(params, channels_per_process=4,
                                registry=reg, pkg_cap_total=64)

iq = make_local_iq(pid)
eng.push(iq)
noise = eng.noise_floor_db
events = [(c, event_to_json(ev)) for c, ev in eng.local_events()]

# optional weak-scaling measurement: repeat the block R times and report
# per-process detector throughput (samples/s); the driver compares per-
# process rates across world sizes for an efficiency percentage
bench_reps = int(sys.argv[5]) if len(sys.argv) > 5 else 0
rate = None
if bench_reps:
    import time
    t0 = time.time()
    for _ in range(bench_reps):
        eng.push(iq)
        eng.local_events()
    dt = time.time() - t0
    rate = bench_reps * iq.shape[1] * iq.shape[0] / dt

with open(outfile, "w") as f:
    json.dump({"pid": pid, "noise": noise, "events": events,
               "samples_per_s": rate}, f)
print(f"worker {pid}: {len(events)} events, noise {noise:.1f} dB")
