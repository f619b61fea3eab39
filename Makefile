# Tiered checks. Every commit touching dsp/, bits/, pulse/, ops/ or
# native/ must pass check-fast first (round-4 postmortem: an untested
# end-of-round optimization shipped a 56-protocol parity regression).
# Model: the reference gates every merge (ref .github/workflows/check.yml).

PY ?= python

.PHONY: check-fast check native asan clean-cache

# < ~10 min: detector goldens + frozen fixture corpus + decoder oracle
# vectors + bit-level unit tests. Catches any detector / slicer /
# decoder-bank regression before it is committed.
check-fast:
	$(PY) -m pytest tests/test_detector.py tests/test_fixture_replay.py \
	    tests/test_decoder_oracle.py tests/test_bits.py -q -x

# the full suite (corpus parity vs the reference binary included)
check:
	$(PY) -m pytest tests/ -q

# native helpers (slicing bank + ingest ring)
native:
	$(MAKE) -C native

# ASan+UBSan build of the native helpers + the differential fuzz suite
# against the sanitized .so (ref CMakeLists.txt:103-105 forces ASan+UBSan
# on Debug builds). The pytest gate tests/test_native_asan.py runs this
# same pass from inside the normal suite.
asan:
	$(PY) -m pytest tests/test_native_asan.py -q -x

clean-cache:
	rm -rf /tmp/tpu433_jax_cache
