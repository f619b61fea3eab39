"""Tests for SigMF, signal grabber, dumpers, conf files, stats (SURVEY.md
§2 components 2, 26-ish, 29, 31)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rtl_433_tpu.confparse import parse_conf_text
from rtl_433_tpu.io import sigmf
from rtl_433_tpu.io.grab import Dumper, SampGrab


def _nexus_iq(n=131072):
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import synth_ook
    word = (0x4C << 28) | (1 << 27) | (215 << 12) | (0xF << 8) | 45
    bits = [(word >> (35 - i)) & 1 for i in range(36)]
    pulses = []
    for _ in range(4):
        pulses += [(500, 2000 if b else 1000) for b in bits]
        pulses.append((500, 4000))
    sig = synth_ook(pulses, rate=250_000)
    rng = np.random.default_rng(5)
    iq = rng.integers(123, 133, size=(n, 2), dtype=np.uint8)
    iq[2000:2000 + sig.shape[0]] = sig[:max(0, n - 2000)]
    return iq


def test_sigmf_roundtrip(tmp_path):
    iq = _nexus_iq(4096)
    path = str(tmp_path / "test.sigmf")
    sigmf.write(path, iq, 250_000, 433920000)
    info = sigmf.read(path)
    assert info.sample_rate == 250_000
    assert info.frequency == 433920000
    np.testing.assert_array_equal(info.data, iq)


def test_sigmf_decode_e2e(tmp_path):
    from rtl_433_tpu.api import RtlTpu
    iq = _nexus_iq()
    path = str(tmp_path / "nexus.sigmf")
    sigmf.write(path, iq, 250_000, 433920000)
    rx = RtlTpu(register_all=False)
    rx.registry.register(19)
    evs = rx.decode_file(path)
    assert evs and evs[0].get("model") == "Nexus-TH"


def test_samp_grab(tmp_path):
    grab = SampGrab(250_000, 433.92e6, out_dir=str(tmp_path))
    blocks = [np.full((1000, 2), i, np.uint8) for i in range(3)]
    for b in blocks:
        grab.push(b)
    path = grab.write()
    assert os.path.basename(path) == "g000_433.92M_250k.cu8"
    data = np.fromfile(path, np.uint8).reshape(-1, 2)
    assert data.shape[0] == 3000
    # second write gets the next index
    grab.push(blocks[0])
    path2 = grab.write()
    assert "g001" in path2


def test_dumper_formats(tmp_path):
    iq = _nexus_iq(256)
    for fmt, dtype, factor in (("cu8", np.uint8, 2), ("cs16", np.int16, 2),
                               ("cf32", np.float32, 2)):
        spec = str(tmp_path / f"dump.{fmt}")
        d = Dumper(spec, 250_000)
        d.push(iq)
        d.close()
        out = np.fromfile(spec, dtype)
        assert out.size == 256 * factor


def test_conf_parse():
    argv = parse_conf_text("""
# comment
frequency 433.92M
sample_rate 250k
protocol 19   # nexus
output json
report_meta stats
""")
    assert argv == ["-f", "433.92M", "-s", "250k", "-R", "19",
                    "-F", "json", "-M", "stats"]
    with pytest.raises(ValueError):
        parse_conf_text("bogus_keyword 1")


def test_conf_parse_brace_blocks():
    """Multi-line ``decoder { ... }`` args (ref src/confparse.c:124-143):
    the block ends at a ``}`` that is last on its line; an inner bit-width
    brace like {8} must not terminate it."""
    argv = parse_conf_text("""
decoder {
    name=X,
    m=OOK_PWM,
    get=@0:{8}:id,
    bits=13,
}
frequency 433.92M
""")
    assert argv[0] == "-X"
    fields = [f.strip() for f in argv[1].split(",") if f.strip()]
    assert fields == ["name=X", "m=OOK_PWM", "get=@0:{8}:id", "bits=13"]
    assert argv[2:] == ["-f", "433.92M"]
    # single-line spec whose last field ends in a bit-width brace
    argv = parse_conf_text("decoder n=Y,m=OOK_PPM,get=seq:@56:{8}\n")
    assert argv == ["-X", "n=Y,m=OOK_PPM,get=seq:@56:{8}"]


def test_cli_conf_and_stats(tmp_path):
    from synth import write_cu8
    iq = _nexus_iq()
    cu8 = str(tmp_path / "sig.cu8")
    iq.tofile(cu8)
    conf = tmp_path / "my.conf"
    conf.write_text("protocol 19\noutput json\nreport_meta stats\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "rtl_433_tpu.cli", "-c", str(conf),
         "-s", "250000", "-r", cu8],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert any('"model" : "Nexus-TH"' in l for l in lines), out.stdout
    stats = json.loads(lines[-1])
    assert stats["frames"]["count"] >= 1
    assert any(s["ok"] >= 1 for s in stats["stats"])


def test_shipped_conf_examples_load():
    """Every conf/ example must parse; flex specs must create working
    decoders and protocol selections must resolve in the registry
    (the stock conf set, ref conf/)."""
    import glob
    import os
    from rtl_433_tpu.confparse import parse_conf_file
    from rtl_433_tpu.decoders.flex import flex_create_device
    from rtl_433_tpu.decoders.base import Registry
    n_slots = len(Registry().slots) - 1
    files = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                   "conf", "*.conf"))
    assert len(files) >= 90
    n_flex = 0
    for path in files:
        args = parse_conf_file(path)
        assert args, path
        it = iter(range(len(args)))
        i = 0
        while i < len(args):
            opt = args[i]
            val = args[i + 1] if i + 1 < len(args) \
                and not args[i + 1].startswith("-") else None
            if opt == "-X":
                dev = flex_create_device(val)
                assert dev.decode_fn is not None, path
                n_flex += 1
            elif opt == "-R":
                num = int(val.lstrip("-"))
                assert 1 <= num <= n_slots, (path, num)
            i += 2 if val is not None else 1
    assert n_flex >= 60
