.PHONY: test quality bench

test:
	python -m pytest tests/ -q

quality:
	python -m pyflakes tfimm_tpu || true

bench:
	python bench.py
