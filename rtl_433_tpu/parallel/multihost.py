"""Multi-host (multi-process) execution helpers.

The reference is a single process (SURVEY §2 "Distributed communication
backend: none"); the TPU framework scales across hosts with jax.distributed:
each process drives its local chips, channels are sharded over a global
``("host", "ch")`` mesh (host axis rides DCN, channel axis ICI), and the
noise-floor collective runs hierarchically across both axes. Event decode
is partitioned: every process decodes the packages of its *own* channels
(device-side compaction emits replicated output, filtered by ownership), so
no IQ-rate data ever crosses DCN — only the pmean scalar does.

Tested hardware-free by tests/test_multihost.py: two CPU processes with 4
virtual devices each form an 8-device global mesh and must produce exactly
the events of a single-process run.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_count: Optional[int] = None):
    """jax.distributed bootstrap (call before any other JAX API)."""
    import jax
    kw = {}
    if local_device_count is not None:
        kw["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_mesh(axes: Sequence[str] = ("host", "ch")):
    """2-D mesh: process (DCN) axis x local-device (ICI) axis."""
    import jax
    from jax.sharding import Mesh
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nproc = max(d.process_index for d in devs) + 1
    per = len(devs) // nproc
    arr = np.array(devs).reshape(nproc, per)
    return Mesh(arr, axes)


def make_global(local_np: np.ndarray, mesh, spec):
    """Assemble a channel-sharded global array from per-process local rows.

    ``local_np`` holds this process's channels (global channel count =
    local * num_processes, process-major order).
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    nproc = mesh.devices.shape[0]
    global_shape = (local_np.shape[0] * nproc,) + local_np.shape[1:]

    def cb(index):
        # index is a global slice for one shard; translate to local rows
        sl = index[0]
        start = 0 if sl.start is None else sl.start
        stop = global_shape[0] if sl.stop is None else sl.stop
        local0 = jax.process_index() * local_np.shape[0]
        return local_np[start - local0: stop - local0][
            (slice(None),) + tuple(index[1:])]

    return jax.make_array_from_callback(global_shape, sharding, cb)


class MultiHostEngine:
    """Channel-sharded detector spanning all processes.

    Same numeric path as parallel.sharding.ShardedEngine, assembled for
    multi-controller execution: state is created via make_array_from_callback,
    the per-block step runs under shard_map on the global mesh, and
    ``local_packages()`` returns only this process's channels' packages.
    """

    def __init__(self, params, channels_per_process: int, registry=None,
                 pkg_cap_total: int = 256,
                 center_frequency: float = 433_920_000.0):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # pragma: no cover
            from jax import shard_map  # type: ignore

        from ..dsp.engine import (compact_packages, detector_init,
                                  process_block)

        self.params = params
        self.registry = registry
        self.center_frequency = center_frequency
        self.mesh = global_mesh()
        self.nproc = self.mesh.devices.shape[0]
        self.local_channels = channels_per_process
        self.channels = channels_per_process * self.nproc
        self.pkg_cap_total = pkg_cap_total
        self._stream_pos = 0
        self._base = 0
        self._undrained = False
        self._pending = []

        spec = P(("host", "ch"))
        self._spec = spec
        host_state = detector_init(params, self.channels)
        self.state = jax.tree.map(
            lambda a: make_global(
                np.asarray(a)[self._local_slice()], self.mesh,
                P(("host", "ch"), *([None] * (a.ndim - 1)))),
            host_state)

        def local_step(state, iq):
            state, avg_db = process_block(params, state, iq, None,
                                          flush=False)
            noise = jnp.mean(avg_db)
            noise = lax.pmean(lax.pmean(noise, "ch"), "host")
            return state, avg_db, noise

        specs_state = jax.tree.map(
            lambda a: P(("host", "ch"), *([None] * (a.ndim - 1))),
            host_state)
        self._step = jax.jit(shard_map(
            local_step, mesh=self.mesh,
            in_specs=(specs_state, P(("host", "ch"))),
            out_specs=(specs_state, P(("host", "ch")), P()),
            check_rep=False))
        # compaction runs over the global state; output replicated so each
        # process filters its own channels
        self._compact = jax.jit(
            functools.partial(compact_packages, cap=pkg_cap_total),
            out_shardings=NamedSharding(self.mesh, P()))

    def _local_slice(self):
        import jax
        pid = jax.process_index()
        lo = pid * self.local_channels
        return slice(lo, lo + self.local_channels)

    def push(self, local_iq: np.ndarray):
        """Feed this process's [local_channels, N, 2] CU8 block.

        As in ShardedEngine.push: undrained device packages are harvested
        with the publishing block's base before the next block lands, so
        absolute offsets stay correct across multiple pushes per drain.
        """
        import jax
        from jax.sharding import PartitionSpec as P
        if self._undrained:
            self._harvest()
        self._base = self._stream_pos
        self._stream_pos += int(local_iq.shape[1])
        self._undrained = True
        self._block_len = local_iq.shape[1]
        iq = make_global(local_iq, self.mesh,
                         P(("host", "ch"), None, None))
        self.state, avg_db, noise = self._step(self.state, iq)
        # the pmean output is replicated over the global mesh (out_specs
        # P()), so every process holds the same value in its addressable
        # shard — read it locally, no cross-host gather needed
        try:
            self.noise_floor_db = float(np.asarray(
                noise.addressable_data(0)))
        except (AttributeError, IndexError):
            self.noise_floor_db = float(np.asarray(noise))
        return avg_db

    def _harvest(self):
        import jax.numpy as jnp
        from ..dsp.engine import packages_from_compact
        comp = self._compact(self.state)
        comp = {k: np.asarray(v) for k, v in comp.items()}
        pkgs, _ = packages_from_compact(comp)
        sl = self._local_slice()
        self.state = dict(self.state,
                          out_n=jnp.zeros_like(self.state["out_n"]))
        for p in pkgs:
            p["base"] = self._base
        self._pending.extend(
            p for p in pkgs if sl.start <= p["channel"] < sl.stop)
        self._undrained = False

    def local_packages(self):
        """This process's channels' published packages (and reset slots).

        Each package carries ``base``: the absolute stream position of the
        block that published it."""
        self._harvest()
        pkgs, self._pending = self._pending, []
        return pkgs

    def local_events(self):
        """Decode this process's packages into (channel, Event) tuples."""
        from ..dsp.engine import PKG_FSK
        from ..pulse.data import PulseData
        out = []
        for pkg in self.local_packages():
            pd = PulseData(
                pulse=pkg["pulse"].tolist(), gap=pkg["gap"].tolist(),
                sample_rate=self.params.sample_rate,
                offset=pkg["base"] + pkg["start"],
                ook_low_estimate=pkg["ook_low_estimate"],
                ook_high_estimate=pkg["ook_high_estimate"],
                fsk_f1_est=pkg["fsk_f1_est"], fsk_f2_est=pkg["fsk_f2_est"])
            pd.calc_rssi_snr(self.params.sample_rate, self.center_frequency,
                             sample_size=2,
                             use_mag_est=self.params.use_mag_est)
            ch = pkg["channel"]
            cb = lambda dev, ev, _c=ch: out.append((_c, ev))
            if pkg["type"] == PKG_FSK:
                self.registry.run_fsk_demods(pd, cb)
            else:
                self.registry.run_ook_demods(pd, cb)
        return out
