"""Channel-sharded execution of the pulse-detection engine.

The reference is single-process/single-threaded (SURVEY.md §2 "Parallelism
strategies"); the TPU framework *invents* the parallel decomposition:

- **dp ("ch" axis)** — channel data-parallelism: independent receiver
  channels are the leading axis of every state leaf and of the IQ block;
  `shard_map` splits them across the mesh. This is the production scale-out
  axis (BASELINE.md: >=10k channels of 250 kS/s on a v5e-16).
- **collectives** — the only cross-channel coupling is diagnostic: the
  global noise floor is a `lax.pmean` over the mesh (the TPU equivalent of
  the reference's process-wide noise EWMA, ref src/r_flow.c:166-194). It
  rides ICI; no other communication exists on the hot path, so scaling is
  embarrassingly linear by construction.
- **sp (time axis)** — within a channel the engine already processes the
  sample axis as a `lax.scan` with an O(1) carried-state pytree; sequence
  sharding across chips is IMPLEMENTED in ``parallel/timeshard.py``:
  speculative overlap-save with a ``lax.ppermute`` halo exchange and
  on-device inductive verification, bit-identical to the sequential run.
  Channels are abundant in the target deployment, so dp is the primary
  axis; the carry contract is what makes sp possible at all.

Mesh layouts: 1-D ``("ch",)`` within a slice; 2-D ``("host", "ch")`` for
multi-host runs where the host axis rides DCN and channels within a host
ride ICI. Both shard channels; the 2-D form keeps the pmean hierarchical.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.maps import shard_map  # type: ignore

from ..dsp.engine import (DetectorParams, compact_packages, detector_init,
                          packages_from_compact, process_block, PKG_FSK)


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("ch",),
              devices=None) -> Mesh:
    """Build a device mesh for channel sharding.

    1-D ``("ch",)`` uses all (or the first ``n_devices``) devices on the
    channel axis; 2-D ``("host", "ch")`` factors them as
    ``n_hosts x per_host`` (DCN x ICI).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if len(axes) == 1:
        return Mesh(devices, axes)
    if len(axes) == 2:
        n = devices.size
        hosts = max(1, len({getattr(d, "process_index", 0) for d in devices.flat}))
        if n % hosts:
            hosts = 1
        return Mesh(devices.reshape(hosts, n // hosts), axes)
    raise ValueError(f"unsupported mesh axes {axes!r}")


def _channel_spec(mesh: Mesh) -> P:
    """Channels are sharded over every mesh axis (flattened)."""
    return P(tuple(mesh.axis_names))


def shard_state(state, mesh: Mesh):
    """Place a detector-state pytree on the mesh, channel axis sharded."""
    sharding = NamedSharding(mesh, _channel_spec(mesh))
    return jax.device_put(state, sharding)


def shard_block(iq, mesh: Mesh):
    """Place an IQ block [C, N, 2] on the mesh, channel axis sharded."""
    return jax.device_put(iq, NamedSharding(mesh, _channel_spec(mesh)))


def sharded_process_block(params: DetectorParams, mesh: Mesh,
                          flush: bool = False, donate: bool = True):
    """Jitted, mesh-sharded engine step.

    Returns ``fn(state, iq, n_valid) -> (state, avg_db, noise_floor_db)``
    where ``noise_floor_db`` is the mesh-global mean block level (a `pmean`
    over all mesh axes — the one ICI/DCN collective in the hot path).
    """
    spec = _channel_spec(mesh)
    axis_names = tuple(mesh.axis_names)

    def local(state, iq, n_valid):
        state, avg_db = process_block(params, state, iq, n_valid, flush=flush)
        noise = jnp.mean(avg_db)
        for ax in axis_names:
            noise = lax.pmean(noise, ax)
        return state, avg_db, noise

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=(spec, spec, P()),
        check_rep=False)
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def sharded_init(params: DetectorParams, channels: int, mesh: Mesh):
    """Fresh detector state, already placed on the mesh.

    ``channels`` must divide evenly by the mesh size.
    """
    n = mesh.devices.size
    if channels % n:
        raise ValueError(f"channels ({channels}) must be a multiple of the "
                         f"mesh size ({n})")
    state = detector_init(params, channels)
    return shard_state(state, mesh)


class ShardedEngine:
    """Convenience wrapper: a multi-channel engine spread over a mesh.

    The TPU analogue of running N independent rtl_433 processes: one state
    pytree, channels sharded, one compiled step for all of them.
    """

    def __init__(self, params: DetectorParams, channels: int,
                 mesh: Optional[Mesh] = None, registry=None,
                 center_frequency: float = 433_920_000.0,
                 pkg_cap_total: int = 2048):
        self.params = params
        self.mesh = mesh if mesh is not None else make_mesh()
        self.channels = channels
        self.state = sharded_init(params, channels, self.mesh)
        self._step = sharded_process_block(params, self.mesh, flush=False)
        self._flush_step = sharded_process_block(params, self.mesh, flush=True)
        self.noise_floor_db = None
        self.center_frequency = center_frequency
        self.registry = registry
        self.pkg_cap_total = pkg_cap_total
        self.n_pkg_dropped = 0
        self._stream_pos = 0
        self._base = 0
        self._undrained = False
        self._pending = []
        self._compact = jax.jit(
            functools.partial(compact_packages, cap=pkg_cap_total))

    def push(self, iq, n_valid=None, flush: bool = False):
        """Feed one [C, N, 2] CU8 block; returns per-channel block dB.

        Package ``start`` offsets published by the device are relative to
        the block that published them, so any packages still sitting in
        device slots are harvested (with this block's base) BEFORE the next
        block is pushed — callers may push several blocks between drains
        without corrupting absolute offsets.
        """
        if n_valid is None:
            n_valid = iq.shape[1]
        if self._undrained:
            self._harvest()
        self._base = self._stream_pos
        self._stream_pos += int(n_valid)
        self._undrained = True
        self._block_len = iq.shape[1]
        iq = shard_block(jnp.asarray(iq), self.mesh)
        step = self._flush_step if flush else self._step
        self.state, avg_db, noise = step(self.state, iq, jnp.int32(n_valid))
        self.noise_floor_db = noise
        return avg_db

    # -- scaled event service ------------------------------------------------
    #
    # sharded detect -> device-side package compaction -> one small transfer
    # -> batched slice/decode on the host -> per-channel-attributed events
    # (the TPU-scale analogue of ref src/r_flow.c:241-340 per-package loop).

    def _harvest(self):
        """Fetch device packages, stamping the publishing block's base."""
        comp = self._compact(self.state)
        pkgs, count = packages_from_compact(comp)
        if count > len(pkgs):
            self.n_pkg_dropped += count - len(pkgs)
        self.state = dict(self.state,
                          out_n=jnp.zeros_like(self.state["out_n"]))
        for pkg in pkgs:
            pkg["base"] = self._base
        self._pending.extend(pkgs)
        self._undrained = False

    def take_packages(self):
        """Compact + fetch all published packages (resets device slots).

        Each returned package dict carries ``base``: the absolute stream
        position of the block that published it (``base + start`` is the
        absolute sample offset of the package start)."""
        self._harvest()
        pkgs, self._pending = self._pending, []
        return pkgs

    def use_decode_pool(self, n_workers: Optional[int] = None):
        """Fan host decode out across worker processes (decoders/pool.py).

        Channel-affine and order-preserving, so stateful decoders and
        event order are unchanged; call close_decode_pool() (or rely on
        process exit — workers are daemonic) when done."""
        from ..decoders.pool import DecodePool
        self._decode_pool = DecodePool(self.registry, n_workers=n_workers)
        return self._decode_pool

    def close_decode_pool(self):
        pool = getattr(self, "_decode_pool", None)
        if pool is not None:
            pool.close()
            self._decode_pool = None

    def drain_events(self, block_len: Optional[int] = None):
        """Decode all published packages into channel-attributed events.

        Requires a ``registry`` (decoders.Registry). Returns a list of
        (channel, Event). The pulse->event path is identical to the
        single-channel flow (same slicers, decoders, priority semantics).
        With :meth:`use_decode_pool` active, packages decode on the worker
        pool (channel-affine, order-preserving) instead of inline.
        """
        from ..pulse.data import PulseData
        if self.registry is None:
            raise ValueError("ShardedEngine needs registry= for events")
        pool = getattr(self, "_decode_pool", None)
        out = []
        pkgs = self.take_packages()
        if self.registry.device_slice and pkgs:
            # one batched kernel pass slices every new train in this drain
            self.registry.prewarm_trains(
                [(pkg["type"] == PKG_FSK, pkg["pulse"], pkg["gap"])
                 for pkg in pkgs], self.params.sample_rate)
        for pkg in pkgs:
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
            is_fsk = pkg["type"] == PKG_FSK
            if pool is not None:
                pool.submit(ch, is_fsk, pd)
                continue
            cb = lambda dev, ev, _ch=ch: out.append((_ch, ev))
            if is_fsk:
                self.registry.run_fsk_demods(pd, cb)
            else:
                self.registry.run_ook_demods(pd, cb)
        if pool is not None:
            out.extend((ch, ev) for ch, dev, ev in pool.drain())
        return out
