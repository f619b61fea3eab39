"""Noisy/jittered IQ replay parity: the corpus with real-capture warts.

The clean corpus (test_corpus_parity.py) synthesizes ideal signals; real
captures (the reference's rtl_433_tests regression target,
ref .ci/scripts/do_tests.sh:14-22) carry low SNR, transmitter clock
offset, and per-edge timing jitter. This suite re-synthesizes a
modulation-diverse protocol panel under three impairment profiles and
requires our full pipeline to match the reference binary event-for-event
on every file — the contract is *identical behavior under degradation*,
including identical decode failures.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_corpus_parity import (BIN, MIN_PARITY_PROTOCOLS,  # noqa: F401
                                _our_events, _ref_events, build_corpus_entry,
                                rtl433)

# a modulation-diverse panel of protocols with clean-corpus parity:
# OOK_PPM, OOK_PWM, OOK_PCM, MC_ZEROBIT, DMC, PIWM, FSK_PCM, FSK_PWM
PANEL = [
    ("nexus", 19),                 # OOK_PPM
    ("silvercrest", 1),            # OOK_PWM
    ("elv_em1000", 6),             # OOK_PPM
    ("oregon_scientific", 12),     # OOK_MC_ZEROBIT
    ("acurite_txr", 40),           # OOK_PWM
    ("hideki_ts04", 42),           # OOK_DMC
    ("oregon_v1", 50),             # OOK_PWM_OSV1
    ("maverick_et73x", 71),        # OOK_MC_ZEROBIT
    ("lacrosse_tx141x", 73),       # OOK_PWM
    ("lacrosse_tx29", 76),         # FSK_PCM
    ("tpms_toyota", 88),           # FSK_PCM
    ("x10_sec", 99),               # OOK_PPM
    ("efergy_optical", 63),        # FSK_PWM
    ("fineoffset_wh1050", 69),     # OOK_PWM
]

IMPAIRMENTS = [
    ("low_snr", dict(amp=32, noise=6.0, seed_extra=11)),
    ("clock_offset", dict(time_scale=1.004, seed_extra=23)),
    ("jitter", dict(jitter=0.02, seed_extra=37)),
    ("combined", dict(amp=40, noise=5.0, time_scale=0.997, jitter=0.015,
                      seed_extra=53)),
]


def _vector_for(num):
    from test_decoder_oracle import VECTORS
    for vnum, code, min_events in VECTORS:
        if vnum == num and min_events > 0:
            return code
    return None


@pytest.mark.parametrize("impname,kw", IMPAIRMENTS)
def test_noisy_replay_parity(rtl433, tmp_path, impname, kw):
    n_checked = n_decoded = 0
    diffs = []
    for _name, num in PANEL:
        code = _vector_for(num)
        if code is None:
            continue
        path = build_corpus_entry(num, code, str(tmp_path), **kw)
        if path is None:
            continue
        ref = _ref_events(num, path)
        ours = _our_events(num, path)
        n_checked += 1
        if ref:
            n_decoded += 1
        if ours != ref:
            diffs.append((num, impname, len(ours), len(ref),
                          ours[:1], ref[:1]))
    print(f"\n{impname}: {n_decoded}/{n_checked} panel protocols decode "
          f"under impairment, {len(diffs)} DIFF")
    assert not diffs, diffs[:3]
    assert n_checked >= 8, "panel shrank unexpectedly"
    # degradation may legitimately kill marginal decodes, but the panel
    # must not collapse: most protocols still decode on BOTH sides
    assert n_decoded >= n_checked * 6 // 10, (
        f"{impname}: only {n_decoded}/{n_checked} decode — impairment "
        f"profile too harsh to be meaningful")
