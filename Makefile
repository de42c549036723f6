.PHONY: test verify bench

test:
	python -m pytest tests/ -q

# Full pre-submit gate: unit/property tests + every registered query vs
# its DuckDB oracle through the driver-faithful comparison path.
verify: test
	python tools/verify_queries.py

bench:
	python bench.py
