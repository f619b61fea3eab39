"""MIC (checksum) decode-call gates: batched checksum prefilter.

``MIC_GATES[symbol] = (row, invert, checks)`` states a NECESSARY condition
for the decoder to emit an event: some candidate row's byte prefix must
pass every listed digest check (the decoder would otherwise return
DECODE_FAIL_MIC).  ``row`` is -1 for "any row" or a fixed row index;
``invert`` applies BitBuffer.invert() to the candidate rows first; each
check is ``(algo, nbytes, p1, p2, xor_out, mask, cmp, cmp_const)`` where
``cmp >= 0`` compares against ``row[cmp]`` (16-bit algos against
``(row[cmp]<<8)|row[cmp+1]``) and ``cmp == -1`` against ``cmp_const``.

The digests run through the batched kernels in ops/mic.py (the SURVEY §2
row-11 "batched galois/CRC kernels"), so plausibility for all candidate
rows costs one fused call per algorithm.  The fast dispatch
(decoders/base.py) skips the Python decode call for (package, decoder)
pairs whose gate fails and accounts them as ``mic`` failures — event
output is exactly unchanged (the decoder could only have failed), only
the failure-counter *name* is approximated for multi-check decoders whose
first failing check differs.

Auto-derived from decoder source by tools/derive_mic.py (AST analysis of
leading fail guards; only provably-necessary patterns are emitted) and
validated by the decoder-oracle suite: every oracle vector that decodes
must pass its decoder's MIC gate (tests/test_decoder_oracle.py) plus the
gated-dispatch differential fuzz (tests/test_native_slicers.py).
"""

import numpy as np

_DIGESTS16 = {"crc16", "crc16lsb", "lfsr_digest16"}

# (row, invert, ((algo, nbytes, p1, p2, xor_out, mask, cmp, cmp_const), ...))
MIC_GATES = {
    'acurite_606': (-1, False, (('lfsr_digest8', 3, 152, 241, 0, None, 3, None),)),
    'bm5': (0, True, (('add_bytes', 10, 0, 0, 0, 255, 10, None),)),
    'companion_wtr001': (-1, False, (('parity_bytes', 2, 0, 0, 0, None, -1, 1),)),
    'gasmate_ba1008': (0, False, (('add_nibbles', 4, 0, 0, 0, 15, -1, 12),)),
    'govee_h5054': (-1, True, (('crc16', 6, 4129, 7439, 0, None, -1, 0),)),
    'omni': (-1, False, (('crc8', 9, 151, 170, 0, None, 9, None),)),
    'revolt_nc5462': (0, True, (('add_bytes', 11, 0, 0, 0, 255, 11, None),)),
    'rubicson_pool_48942': (-1, True, (('crc8', 4, 49, 0, 0, None, 4, None),)),
    'tfa_30_3221': (-1, True, (('lfsr_digest8_reflect', 4, 49, 244, 0, None, 4, None),)),
    'tfa_drop_303233': (-1, True, (('lfsr_digest8_reflect', 7, 49, 244, 0, None, 7, None),)),
    'thermopro_tp11': (-1, False, (('lfsr_digest8_reflect', 3, 81, 4, 0, None, 3, None),)),
    'wt1024': (1, False, (('xor_bytes', 4, 0, 0, 0, None, 4, None),)),
}


def _digest(algo, rows, nbytes, p1, p2):
    from ..ops import mic
    fn = getattr(mic, algo)
    if algo in ("add_bytes", "xor_bytes", "add_nibbles", "parity_bytes"):
        return np.asarray(fn(rows, nbytes), np.int64)
    return np.asarray(fn(rows, nbytes, p1, p2), np.int64)


def rows_pass(rows: np.ndarray, spec) -> bool:
    """Can ANY candidate row satisfy every check?  ``rows``: the
    bitbuffer's zero-padded row byte storage [num_rows, >=max_nbytes+2]
    (already inverted if the spec demands it)."""
    row_sel, _invert, checks = spec
    if row_sel >= 0:
        if row_sel >= rows.shape[0]:
            return False  # the decoder would abort on length anyway
        rows = rows[row_sel:row_sel + 1]
    if rows.shape[0] == 0:
        return False
    ok = np.ones(rows.shape[0], bool)
    for (algo, nbytes, p1, p2, xor_out, mask, cmp, cmp_const) in checks:
        d = _digest(algo, rows, nbytes, p1, p2) ^ xor_out
        if mask is not None:
            d = d & mask
        if cmp >= 0:
            if algo in _DIGESTS16 and cmp_const is None:
                exp = (rows[:, cmp].astype(np.int64) << 8) \
                    | rows[:, cmp + 1]
            else:
                exp = rows[:, cmp].astype(np.int64)
        else:
            exp = cmp_const
        ok &= (d == exp)
        if not ok.any():
            return False
    return True


def gate_bits(bits, spec) -> bool:
    """Evaluate a MIC gate on a materialized BitBuffer."""
    row_sel, invert, _checks = spec
    if invert:
        bits = bits.clone()
        bits.invert()
    rows = np.asarray(bits.bb[:bits.num_rows])
    return rows_pass(rows, spec)
