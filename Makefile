# Developer entry points (see CLAUDE.md for timings on this box).

.PHONY: test-fast test native bench

# Fast default path: skips the torch-importing parity oracles (~20 of the
# ~25 full-suite minutes on the 1-core box). Run `make test` before release.
# SAFEVLA_SKIP_ORACLES=1 drops the oracle modules at COLLECTION time (even
# importing them costs minutes: torch + reference-source imports).
test-fast:
	SAFEVLA_SKIP_ORACLES=1 python -m pytest tests/ -q -m "not oracle and not slow"

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py
