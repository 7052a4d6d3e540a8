# Local CI entry point — mirrors .github/workflows/ci.yaml (which mirrors
# the reference's .github/workflows/ci.yaml: lint + test).
.PHONY: ci lint test native bench

ci: lint native test

lint:
	python -m compileall -q solstrale_tpu tests tools bench.py __graft_entry__.py

native:
	$(MAKE) -C solstrale_tpu/native

test:
	python -m pytest tests/ -q

bench:
	python bench.py
