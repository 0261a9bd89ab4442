# Developer workflow (role parity with reference Makefile: setup / format / test).

.PHONY: setup test test-fast format lint bench

setup:
	pip install -e .

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_ops.py tests/test_quantized.py tests/test_model_io.py -q

format:
	python -m isort diffusionkit_tpu tests *.py 2>/dev/null || true
	python -m black diffusionkit_tpu tests *.py 2>/dev/null || true

lint:
	python -m pyflakes diffusionkit_tpu tests *.py 2>/dev/null || \
	python -m flake8 --select=F diffusionkit_tpu tests *.py 2>/dev/null || true

bench:
	python bench.py
