# grit_tpu developer targets

.PHONY: test test-fast bench native parity clean

# Full-size caption fidelity harness vs the torch reference at identical
# (random) weights — run after ANY model-touching change.  The day real
# released checkpoints are reachable, swap --random for --ckpt <file> and
# this same command is the CIDEr-parity acceptance test (VERDICT r2 item 1).
parity:
	JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="" \
		python tools/checkpoint_parity.py --random --f64

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_core.py tests/test_metrics.py tests/test_data.py \
		tests/test_engine.py tests/test_solver.py tests/test_det_data.py -q

bench:
	python bench.py

native:
	python -c "from grit_tpu import native; assert native.available(); print('fastmetrics built')"

clean:
	rm -rf outputs __pycache__ grit_tpu/native/_fastmetrics.so .pytest_cache
	find . -name '__pycache__' -type d -exec rm -rf {} + 2>/dev/null || true
