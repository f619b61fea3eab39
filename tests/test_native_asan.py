"""Sanitized native-code gate: run the native differential test suites
against an ASan+UBSan instrumented build of the C++ helpers.

The reference forces ASan+UBSan on every Debug build and runs the whole
ctest suite under it (ref CMakeLists.txt:103-105); our equivalent re-runs
the native slicer/ingest differential tests in a subprocess with
``TPU433_NATIVE_ASAN=1`` (loaders pick the ``*_asan.so`` variants) and the
ASan runtime LD_PRELOADed — dlopen of an instrumented .so requires the
runtime to be loaded first.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def _libasan():
    for cc in ("g++", "gcc"):
        try:
            p = subprocess.run([cc, "-print-file-name=libasan.so"],
                               capture_output=True, text=True, timeout=30)
            path = p.stdout.strip()
            if path and os.path.sep in path and os.path.exists(path):
                return os.path.realpath(path)
        except OSError:
            pass
    return None


@pytest.mark.skipif(os.environ.get("TPU433_NATIVE_ASAN") == "1",
                    reason="already inside the sanitized run")
def test_native_suites_under_asan_ubsan():
    asan = _libasan()
    if asan is None:
        pytest.skip("libasan not found")
    r = subprocess.run(["make", "-C", NATIVE, "asan"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["TPU433_NATIVE_ASAN"] = "1"
    env["LD_PRELOAD"] = asan
    # leak checking would flag CPython/XLA internals, not our code; ASan
    # still reports every overflow/UAF/UB in the .so under test
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    # JAX cannot run under a PRELOADed ASan runtime (XLA's CPU runtime
    # trips the interceptors), so the sanitized pass covers every native
    # differential test that stays off the JAX compute path: the whole
    # slicer-bank fuzz + the ingest converters and the threaded SPSC ring.
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_native_slicers.py",
         "tests/test_native.py::test_cs8_to_cu8",
         "tests/test_native.py::test_cf32_to_cs16",
         "tests/test_native.py::test_block_ring",
         "tests/test_native.py::test_block_ring_threaded",
         "-q", "-x", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    tail = (r.stdout + r.stderr)[-4000:]
    assert r.returncode == 0, f"sanitized native suite failed:\n{tail}"
    assert "passed" in r.stdout, tail
