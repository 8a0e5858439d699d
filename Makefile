.PHONY: test quality style bench docs

test:
	python -m pytest tests/ -q

# pyflakes when installed; otherwise the AST subset in scripts/lint.py
# (unused imports, duplicate defs, ==None, placeholder-free f-strings).
quality:
	@if python -c "import pyflakes" 2>/dev/null; then \
	  python -m pyflakes tfimm_tpu tests scripts; \
	else \
	  python scripts/lint.py tfimm_tpu tests scripts; \
	fi

bench:
	python bench.py

# Lint/format (mirror of the reference Makefile quality/style targets;
# black/isort are optional — pyflakes is the gate that CI enforces).
style:
	black tfimm_tpu tests scripts 2>/dev/null || echo "black not installed"
	isort tfimm_tpu tests scripts 2>/dev/null || echo "isort not installed"

docs:
	@python -c "import sphinx, myst_parser" 2>/dev/null \
	  && sphinx-build -b html docs docs/_build/html \
	  || python scripts/build_docs.py
