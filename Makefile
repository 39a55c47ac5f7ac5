# Developer gates. `make smoke` is the MANDATORY pre-commit check: it proves
# the package imports and the test suite collects — the two failure modes
# that can silently zero an entire round of driver evidence (a NameError at
# import time kills the correctness harness, the bench, AND pytest at once).
#
# bash + pipefail so a collection failure is NOT swallowed by the tail pipe
# (with the default sh, the pipeline's status is tail's — the gate would
# pass on exactly the failure it exists to catch).
SHELL := /bin/bash
.SHELLFLAGS := -o pipefail -c
.PHONY: smoke test bench

smoke:
	python -c "import dblp_to_csv_spark.operators; from dblp_to_csv_spark.registry import all_queries; n = len(all_queries()); assert n >= 90, n; print(f'smoke OK: {n} queries registered')"
	python -m pytest tests/ --collect-only -q 2>&1 | tail -1

test: smoke
	python -m pytest tests/ -q

bench: smoke
	python bench.py
