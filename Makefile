# grit_tpu developer targets

.PHONY: test test-fast bench native clean

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
