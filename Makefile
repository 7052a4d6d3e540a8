# Local CI entry point — mirrors .github/workflows/ci.yaml (which mirrors
# the reference's .github/workflows/ci.yaml: lint + test).
.PHONY: ci lint test test-all native bench tpu-smoke

ci: lint native test

lint:
	python tools/lint.py

native:
	$(MAKE) -C solstrale_tpu/native

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

tpu-smoke:
	python tools/tpu_smoke.py
