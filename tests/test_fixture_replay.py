"""Frozen capture-style fixture replay (the rtl_433_tests analogue).

The reference's regression corpus is a repo of captured IQ files laid out
``<device>/gNNN_<freq>M_<rate>k.cu8`` with expected JSON, replayed with
``-r`` and diffed (ref .ci/scripts/do_tests.sh:14-22). This suite walks
the committed ``tests/fixtures/`` tree the same way: each ``.cu8`` is a
frozen impaired capture (SNR-degraded / clock-offset / edge-jittered,
generated once by tools/make_fixtures.py) and the ``.json`` beside it is
the *reference binary's* decode of those exact bytes. Any regression in
DSP, detector, slicer, decoder, or normalization shows up as a diff
against fixed input bytes — no synthesis at test time.
"""

import glob
import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _cases():
    out = []
    for cu8 in sorted(glob.glob(os.path.join(FIXTURES, "*", "*.cu8"))):
        ddir = os.path.dirname(cu8)
        with open(os.path.join(ddir, "protocol")) as f:
            # one or more protocol numbers (multi-protocol streams hold
            # several transmitters in one capture)
            nums = [int(x) for x in f.read().split()]
        out.append((os.path.basename(ddir),
                    nums[0] if len(nums) == 1 else nums, cu8))
    return out


CASES = _cases()


def test_fixture_tree_present():
    assert len(CASES) >= 100, "fixture corpus went missing or shrank"
    for _name, _num, cu8 in CASES:
        assert os.path.exists(cu8.replace(".cu8", ".json"))


@pytest.mark.parametrize("name,num,cu8", CASES,
                         ids=[c[0] for c in CASES])
def test_fixture_replay(name, num, cu8):
    from test_corpus_parity import _our_events

    with open(cu8.replace(".cu8", ".json")) as f:
        want = [json.loads(line) for line in f if line.strip()]
    got = _our_events(num, cu8)
    assert got == want, (
        f"{name}: decoded {len(got)} events != expected {len(want)}\n"
        f"got:  {got[:2]}\nwant: {want[:2]}")
