"""Time-axis (sequence) sharding of the pulse-detection engine.

Splits ONE block's sample axis across mesh devices so a single hot channel
is no longer capped at one chip's sequential scan rate — the last
parallelism axis named by SURVEY.md §2 ("overlap-save halos … carry
propagation for the hysteresis scan"). The numeric contracts preserved are
the block-boundary carries pinned in SURVEY Appendix A (AM low-pass carry,
ref src/baseband.c:167-168; FM discriminator one-sample carry,
src/baseband.c:263-271; detector FSM continuation, src/pulse_detect.c:285-289).

Design — *speculative overlap-save with inductive verification*:

The engine's per-sample FSM is an exact sequential recurrence, so a naive
split would need device ``d`` to wait for device ``d-1``'s final state.
Instead every device runs **speculatively**:

1. The block [C, N, 2] is split into D contiguous chunks along time.
   Device ``d`` receives its chunk plus an H-sample *halo* — the tail of
   chunk ``d-1`` — moved over ICI with one ``lax.ppermute`` (the
   overlap-save halo exchange).
2. Every device seeds the *block-incoming* carry pytree (replicated) and
   scans halo then chunk.  For device 0 the seed is exact and the halo is
   ignored; for d>0 the seed is wrong but the detector state *forgets*:
   the IIRs contract, the level EWMAs re-converge, and the hysteresis FSM
   re-synchronizes at the first end-of-package gap inside the halo.
3. **Verification makes the speculation exact, not approximate**: after
   the parallel pass, device ``d-1``'s chunk-final registers are
   ``ppermute``-d forward and compared with device ``d``'s halo-end
   registers — the same stream position.  If every pair matches, then by
   induction from device 0 every device ran its own chunk from the exact
   sequential state, so the concatenated record logs ARE the sequential
   block's log, bit for bit.  One mismatch anywhere (e.g. a package longer
   than the halo straddling a boundary) raises a replicated flag and the
   caller re-runs the block on the sequential path — output is *always*
   bit-identical to the sequential engine, the halo only decides how often
   the fast path wins.
4. Write-only counters (``gen`` package generation, overflow diagnostics)
   cannot converge from a stale seed — they count events the speculative
   device never saw.  They are excluded from the compare and *re-based*
   instead: an ``all_gather`` of per-chunk package counts yields each
   device's true generation offset, which is added onto its record keys
   and EOP metadata (the FSM never reads these counters, so the offset is
   constant across a chunk).

The publish pass (record-log drain) then runs once on the gathered logs —
identical inputs to the sequential drain, identical outputs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.maps import shard_map  # type: ignore

from ..dsp.engine import (DetectorParams, M_GEN, M_TYPE, PKG_NONE, ST_IDLE,
                          _KEY_IDX_BITS, _KEY_INVALID, _block_scan,
                          _drain_block, _empty_ring, _flush, detector_init)
from .sharding import ShardedEngine

# State keys that are legitimately different between a speculative run and
# the sequential run even after full convergence:
#   - write-only counters (never read by the FSM transition; re-based)
#   - drain-only buffers the scan never touches
#   - transient ring keys (tags/wpos reset at every chunk boundary; the
#     idx/p/g slots hold dead values from already-emitted records)
_COUNTER_KEYS = ("gen", "n_ring_ovf", "n_pkg_drop", "n_fsk_ovf")
_DRAIN_ONLY = ("out_p", "out_g", "out_meta", "out_n", "carry_p", "carry_g")

# Registers that are live at every sample — compared unconditionally.
_VERIFY_ALWAYS = ("lp_y", "lp_x", "fm_y", "fm_phi_prev", "fm_xr", "fm_xi",
                  "ook_state", "lead_in", "low_est", "high_est", "min_high",
                  "eop_spur")
# Package-scoped registers: every one of these is rewritten by the
# package-start reset (engine._step start_mask block, ref
# src/pulse_detect.c:312-323 + pulse_detect_fsk_init) before its next read,
# so while the detector is IDLE they hold stale-but-DEAD values that a
# speculative run cannot know.  They are compared only where the true
# (predecessor) state has a package open; the unconditional ``ook_state``
# compare guarantees both sides agree on open-ness itself.  The rewind
# history (hist_p/hist_g) is package-scoped too: a classic-FSK rewind only
# corrects pairs the *current* package committed, so entries from earlier
# packages are never read.
_VERIFY_OPEN = ("plen", "max_pulse", "num", "cur_pulse", "ook_f1",
                "pkg_start", "fsk_state", "flen", "f1", "f2", "vmax", "vmin",
                "skip", "fsk_num", "fsk_cur_pulse", "hist_p", "hist_g")


def _verify_keys(params: DetectorParams):
    """Sanity split: every persistent state key must be classified."""
    ring = set(_empty_ring(params, 1))
    skip = ring | set(_COUNTER_KEYS) | set(_DRAIN_ONLY)
    keys = set(detector_init(params, 1)) - skip
    classified = set(_VERIFY_ALWAYS) | set(_VERIFY_OPEN)
    missing = keys - classified
    assert not missing, f"unclassified detector state keys: {missing}"
    return tuple(sorted(keys & set(_VERIFY_ALWAYS))), \
        tuple(sorted(keys & set(_VERIFY_OPEN)))


def timeshard_process_block(params: DetectorParams, mesh: Mesh,
                            axis: str = "sp", halo_chunks: int = 10,
                            flush: bool = False, masked: bool = True,
                            debug: bool = False):
    """Build the jitted time-sharded engine step.

    Returns ``fn(state, iq[, n_valid]) -> (state, avg_db, ok)``.  ``iq`` is
    the full block [C, N, 2] (sharded along N over the ``axis`` mesh axis);
    ``state`` is replicated.  ``ok`` is a replicated bool — True means the
    speculation verified and the result is bit-identical to
    :func:`~rtl_433_tpu.dsp.engine.process_block`; False means the caller
    MUST discard the returned state and re-run the block sequentially
    (see :class:`TimeShardEngine`).
    """
    D = int(mesh.shape[axis])
    Ts = params.chunk
    assert halo_chunks >= 1, "halo must cover at least one chunk"
    H = halo_chunks * Ts
    # NOTE: the idle lead-in counter saturates after OOK_EST_LOW_RATIO+1
    # samples (1025 at the default ratio); a halo shorter than that can
    # never re-converge it from a fresh seed, so default to 10 chunks.
    fwd = [(j, j + 1) for j in range(D - 1)]
    vkeys_always, vkeys_open = _verify_keys(params)
    gshift = 1 << _KEY_IDX_BITS

    vk = vkeys_always + vkeys_open

    def _take_cand(leaf3, sel):
        """Select one of 3 hedge candidates per channel: leaf3 [3, C, ...],
        sel [C] -> [C, ...]. Written as a select chain — take_along_axis
        over a size-3 axis lowers to a ~60 ms/leaf gather on TPU."""
        s = sel.reshape(sel.shape + (1,) * (leaf3.ndim - 2))
        return jnp.where(s == 0, leaf3[0],
                         jnp.where(s == 1, leaf3[1], leaf3[2]))

    def local(seed, iq_sh, n_valid, gen0):
        C, S, _ = iq_sh.shape
        d = lax.axis_index(axis)
        is0 = d == 0
        t0_chunk = d * S

        # overlap-save halo: the previous device's tail (device 0 gets
        # zeros and ignores the halo pass entirely)
        halo = lax.ppermute(iq_sh[:, S - H:], axis, fwd)
        regs_h, *_ = _block_scan(params, dict(seed), halo, n_valid,
                                 gen0, t0=t0_chunk - H)
        start = {k: jnp.where(is0, seed[k], v) for k, v in regs_h.items()}

        # Hedge the noise-floor EWMA: low_est's idle update moves +-1
        # toward the sample (ref src/pulse_detect.c:326-333), so the
        # parity of (speculative - true) is invariant through a quiet halo
        # and an odd initial offset can never converge to zero.  All other
        # registers forget; low_est alone needs insurance: run the chunk
        # for low_est in {v-1, v, v+1} (a vmapped candidate axis) and let
        # the verification chain select the candidate whose start equals
        # the predecessor's true boundary value — exact by induction, at
        # 3x chunk compute instead of a near-certain sequential fallback.
        cand = {k: jnp.broadcast_to(v, (3,) + v.shape)
                for k, v in start.items()}
        offs = jnp.array([-1, 0, 1], jnp.int32)
        cand = dict(cand, low_est=start["low_est"][None] + offs[:, None])
        # while IDLE high_est is a pure function of low_est (ref
        # src/pulse_detect.c:331): keep each candidate self-consistent
        idle_m = (start["ook_state"] == ST_IDLE)[None]
        cand["high_est"] = jnp.where(
            idle_m,
            jnp.maximum(params.ook_high_low_ratio * cand["low_est"],
                        start["min_high"][None]),
            start["high_est"][None])

        def scan_one(st):
            return _block_scan(params, dict(st), iq_sh, n_valid, gen0,
                               t0=t0_chunk)
        finals, ky3, py3, gy3, ey3, avg3 = jax.vmap(scan_one)(cand)

        # ---- replicated selection + verification chain.
        # Device d's true chunk-start state is its predecessor's selected
        # chunk-final state; the chain over D devices runs on gathered
        # boundary registers only (tiny), identically on every device.
        g_start = {k: lax.all_gather(start[k], axis) for k in vk}
        g_fin = {k: lax.all_gather(finals[k], axis)
                 for k in vk + ("gen",)}                       # [D, 3, ...]
        g_sgen = lax.all_gather(start["gen"], axis)            # [D, C]

        def chain(prev, st, fin, st_gen, t_gen):
            """One link: verify prev(final) vs st(halo-end), select the
            low_est hedge, advance the true-gen prefix."""
            dlow = prev["low_est"] - st["low_est"]
            sel = jnp.clip(dlow + 1, 0, 2)                     # [C]
            open_m = prev["ook_state"] != ST_IDLE              # [C]
            # high_est of the selected candidate (see cand construction)
            cand_high = jnp.where(
                st["ook_state"] == ST_IDLE,
                jnp.maximum(params.ook_high_low_ratio *
                            (st["low_est"] + dlow), st["min_high"]),
                st["high_est"])
            by_key = [jnp.any(jnp.abs(dlow) > 1),
                      jnp.any(prev["high_est"] != cand_high)]
            for k in vk:
                if k in ("low_est", "high_est"):
                    continue
                b = prev[k] != st[k]
                if k in vkeys_open:
                    m = open_m
                    while m.ndim < b.ndim:
                        m = m[..., None]
                    b = b & m
                by_key.append(jnp.any(b))
            by_key = jnp.stack(by_key)
            bad = jnp.any(by_key)
            delta = t_gen - st_gen                             # [C]
            nxt = {k: _take_cand(fin[k], sel) for k in vk + ("gen",)}
            t_gen = t_gen + (nxt["gen"] - st_gen)
            return nxt, sel, delta, bad, by_key, t_gen

        sel0 = jnp.ones((C,), jnp.int32)
        prev0 = {k: g_fin[k][0, 1] for k in vk + ("gen",)}
        tg0 = gen0 + (g_fin["gen"][0, 1] - g_sgen[0])

        def chain_step(carry, xs):
            prev, t_gen, bad_acc = carry
            st, fin, st_gen = xs
            nxt, sel, delta, bad, by_key, t_gen = chain(prev, st, fin,
                                                        st_gen, t_gen)
            return (nxt, t_gen, bad_acc | bad), (sel, delta, by_key)

        xs = ({k: v[1:] for k, v in g_start.items()},
              {k: v[1:] for k, v in g_fin.items()}, g_sgen[1:])
        (_, _, any_bad), (sels, deltas, by_keys) = lax.scan(
            chain_step, (prev0, tg0, jnp.bool_(False)), xs)
        sels = jnp.concatenate([sel0[None], sels], axis=0)     # [D, C]
        deltas = jnp.concatenate([jnp.zeros((1, C), jnp.int32), deltas],
                                 axis=0)                       # [D, C]
        mism = any_bad.astype(jnp.int32)

        sel_d = sels[d]                                        # [C]
        delta = deltas[d]                                      # [C]
        final = {k: _take_cand(v, sel_d) for k, v in finals.items()}
        # record logs are [3, C*R, G] (ring-major rows): select per
        # channel via a [3, C, R, G] view
        R = params.ring
        ky = _take_cand(ky3.reshape((3, C, R) + ky3.shape[2:]),
                        sel_d).reshape((C * R,) + ky3.shape[2:])
        py = _take_cand(py3.reshape((3, C, R) + py3.shape[2:]),
                        sel_d).reshape((C * R,) + py3.shape[2:])
        gy = _take_cand(gy3.reshape((3, C, R) + gy3.shape[2:]),
                        sel_d).reshape((C * R,) + gy3.shape[2:])
        ey = _take_cand(ey3, sel_d)
        avg = _take_cand(avg3, sel_d)

        # re-base the write-only generation counter onto the true prefix
        kvalid = ky < _KEY_INVALID
        deltaR = jnp.repeat(delta, R)                          # [C*R]
        ky = jnp.where(kvalid, ky + deltaR[:, None] * gshift, ky)
        evalid = ey[:, :, M_TYPE] != PKG_NONE
        ey = ey.at[:, :, M_GEN].add(jnp.where(evalid, delta[:, None], 0))

        # counters: true block-final value = seed + sum of own-chunk
        # increments (replicated by the psum)
        for k in _COUNTER_KEYS:
            final[k] = seed[k] + lax.psum(final[k] - start[k], axis)

        # block-outgoing registers = last device's (counters already
        # replicated; drain-only keys were never touched by the scan)
        is_last = d == D - 1
        regs_out = {}
        for k, v in final.items():
            if k in _DRAIN_ONLY or k in _COUNTER_KEYS:
                regs_out[k] = final[k] if k in _COUNTER_KEYS else seed[k]
            else:
                regs_out[k] = lax.psum(
                    jnp.where(is_last, v, jnp.zeros_like(v)), axis)

        avg = lax.pmean(avg, axis)
        return regs_out, ky, py, gy, ey, avg, mism, by_keys

    def fn(state, iq, n_valid=None):
        C, N, _ = iq.shape
        assert N % D == 0, "block length must divide the sp mesh axis"
        S = N // D
        assert S % Ts == 0, "per-device chunk must be a chunk multiple"
        assert H <= S, "halo must fit in the neighbour's chunk"
        if n_valid is not None:
            n_valid = jnp.asarray(n_valid, jnp.int32)

        # per-call resets — identical seed on every device (ref
        # src/pulse_detect.c:283 and :291; mirrors process_block)
        regs = dict(state)
        regs["high_est"] = jnp.maximum(regs["high_est"], regs["min_high"])
        regs["eop_spur"] = jnp.zeros_like(regs["eop_spur"])
        regs["pkg_start"] = regs["pkg_start"] - \
            (N if n_valid is None else n_valid)
        regs.update(_empty_ring(params, C))
        gen0 = regs["gen"]

        mapped = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(), P()),
            out_specs=(P(), P(None, axis), P(None, axis), P(None, axis),
                       P(None, axis, None), P(), P(), P()),
            check_rep=False)
        regs, log_key, log_p, log_g, eop_log, avg_db, mism, dbg = mapped(
            regs, iq, n_valid, gen0)

        if flush:
            regs, frow = _flush(params, regs,
                                N if n_valid is None else n_valid, gen0)
            log_key = jnp.concatenate([log_key, frow[0].reshape(-1, 1)],
                                      axis=1)
            log_p = jnp.concatenate([log_p, frow[1].reshape(-1, 1)],
                                    axis=1)
            log_g = jnp.concatenate([log_g, frow[2].reshape(-1, 1)],
                                    axis=1)
            eop_log = jnp.concatenate([eop_log, frow[3]], axis=1)

        has_work = jnp.any(log_key < _KEY_INVALID) | \
            jnp.any(eop_log[:, :, M_TYPE] != PKG_NONE)
        regs = lax.cond(
            has_work,
            lambda rr: _drain_block(params, rr, log_key, log_p, log_g,
                                    eop_log, gen0),
            lambda rr: rr, regs)
        for k in _empty_ring(params, C):
            regs.pop(k)

        # exact sequential quirk for the FM discriminator carry on partial
        # blocks: the carry is the sample at max(n_valid-1, 0) of the WHOLE
        # block, even when that lands outside the last device's region
        if not params.pallas_frontend and params.enable_fm:
            last = N - 1 if n_valid is None else jnp.maximum(n_valid - 1, 0)
            regs["fm_xr"] = iq[:, :, 0].astype(jnp.int32)[:, last] - 128
            regs["fm_xi"] = iq[:, :, 1].astype(jnp.int32)[:, last] - 128

        if debug:
            return regs, avg_db, mism == 0, dbg
        return regs, avg_db, mism == 0

    if masked:
        return jax.jit(fn)
    return jax.jit(lambda state, iq: fn(state, iq, None))


class TimeShardEngine(ShardedEngine):
    """A (possibly single-channel) engine whose *sample axis* is sharded.

    Same surface as :class:`~rtl_433_tpu.parallel.sharding.ShardedEngine`
    (push / take_packages / drain_events), but each pushed block is split
    across the mesh along time.  Every block's speculation is verified
    on-device; the rare failure (a package longer than the halo straddling
    a shard boundary) transparently falls back to the sequential engine,
    so the event stream is ALWAYS bit-identical to the unsharded engine.
    ``fallbacks`` counts how many blocks took the sequential path.
    """

    def __init__(self, params: DetectorParams, channels: int = 1,
                 mesh: Optional[Mesh] = None, axis: str = "sp",
                 halo_chunks: int = 10, registry=None,
                 center_frequency: float = 433_920_000.0,
                 pkg_cap_total: int = 2048):
        from ..dsp.engine import compact_packages, process_block
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (axis,))
        self.params = params
        self.mesh = mesh
        self.axis = axis
        self.channels = channels
        self.state = jax.device_put(detector_init(params, channels),
                                    NamedSharding(mesh, P()))
        self._step = timeshard_process_block(
            params, mesh, axis=axis, halo_chunks=halo_chunks, flush=False)
        self._flush_step = timeshard_process_block(
            params, mesh, axis=axis, halo_chunks=halo_chunks, flush=True)
        self._seq_step = jax.jit(functools.partial(process_block, params),
                                 static_argnames=("flush",))
        self.noise_floor_db = None
        self.center_frequency = center_frequency
        self.registry = registry
        self.pkg_cap_total = pkg_cap_total
        self.n_pkg_dropped = 0
        self.fallbacks = 0
        self._stream_pos = 0
        self._base = 0
        self._undrained = False
        self._pending = []
        self._compact = jax.jit(
            functools.partial(compact_packages, cap=pkg_cap_total))

    def push(self, iq, n_valid=None, flush: bool = False):
        """Feed one [C, N, 2] CU8 block, time-sharded over the mesh."""
        if n_valid is None:
            n_valid = iq.shape[1]
        if self._undrained:
            self._harvest()
        self._base = self._stream_pos
        self._stream_pos += int(n_valid)
        self._undrained = True
        self._block_len = iq.shape[1]
        iq = jax.device_put(
            jnp.asarray(iq),
            NamedSharding(self.mesh, P(None, self.axis, None)))
        step = self._flush_step if flush else self._step
        prev_state = self.state
        new_state, avg_db, ok = step(prev_state, iq, jnp.int32(n_valid))
        if not bool(np.asarray(ok)):
            # speculation failed (package longer than the halo crossed a
            # shard boundary): replay this block on the sequential engine
            # from the saved pre-block state — output stays bit-identical
            self.fallbacks += 1
            new_state, avg_db = self._seq_step(prev_state, iq,
                                               jnp.int32(n_valid),
                                               flush=flush)
        self.state = new_state
        self.noise_floor_db = float(np.mean(np.asarray(avg_db)))
        return avg_db
