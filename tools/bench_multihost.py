#!/usr/bin/env python
"""Multi-host scaling-efficiency evidence (VERDICT r4 item 8).

This machine has ONE physical core, so a 2-process weak-scaling wall-clock
measurement only measures core contention. What actually generalizes to
v5e-16 is the per-step cross-host cost of the channel-DP design: ONE
pmean scalar (the hierarchical noise floor) rides DCN per block and no
IQ-rate data ever crosses hosts (parallel/multihost.py). So this harness
measures that collective's latency directly on a REAL jax.distributed
2-process deployment (coordinator + gRPC over loopback): both processes
sit blocked in the collective, so a single core times it faithfully (if
anything it overstates the latency — loopback gRPC shares the core).

Model: v5e-16 = 4 hosts x 4 chips; per-block efficiency
   eff = t_block / (t_block + t_pmean_dcn)
with t_block the measured on-chip signal-dense block time (BASELINE.md
round-5: ~0.70 s at 4096 channels/chip) and t_pmean_dcn measured here.

Run: python tools/bench_multihost.py            (parent)
     (spawns itself with MH_ROLE=worker twice)
"""

import json
import os
import socket
import subprocess
import sys
import time

REPS = int(os.environ.get("MH_BENCH_REPS", "50"))
T_BLOCK_TPU = float(os.environ.get("MH_T_BLOCK", "0.70"))


def worker(coordinator, nproc, pid, outfile):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from rtl_433_tpu.parallel import multihost
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    multihost.initialize(coordinator, nproc, pid)
    mesh = multihost.global_mesh()

    # the per-block collective of the channel-DP pipeline: a psum-mean of
    # one scalar per channel shard across ("host", "ch")
    @jax.jit
    def step(x):
        from jax.experimental.shard_map import shard_map
        f = shard_map(
            lambda v: jnp.mean(jax.lax.pmean(v, ("host", "ch")),
                               keepdims=True),
            mesh=mesh, in_specs=P(("host", "ch")), out_specs=P())
        return f(x)

    sh = NamedSharding(mesh, P(("host", "ch")))
    x = jax.device_put(np.arange(8, dtype=np.float32), sh)
    r = step(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = step(x)
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "pmean_s": dt, "value": float(r[0])}, f)
    print(f"worker {pid}: pmean {dt * 1e3:.3f} ms")


def main():
    if os.environ.get("MH_ROLE") == "worker":
        worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"
    import tempfile
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["MH_ROLE"] = "worker"
    with tempfile.TemporaryDirectory() as td:
        procs, outs = [], []
        for pid in range(2):
            out = os.path.join(td, f"w{pid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), coordinator,
                 "2", str(pid), out],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{stdout[-2000:]}")
        ts = [json.load(open(o))["pmean_s"] for o in outs]
    t_pmean = max(ts)
    eff = T_BLOCK_TPU / (T_BLOCK_TPU + t_pmean)
    print(json.dumps({
        "metric": "multihost_dcn_overhead",
        "pmean_dcn_ms": round(t_pmean * 1e3, 3),
        "t_block_tpu_s": T_BLOCK_TPU,
        "v5e16_model_efficiency": round(eff, 4),
        "target": 0.80,
        "note": "channel-DP: one pmean scalar/block crosses DCN; "
                "no IQ-rate cross-host traffic",
    }))


if __name__ == "__main__":
    main()
