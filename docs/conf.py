# Sphinx configuration (functional mirror of the reference RTD setup,
# docs/source/conf.py, adapted to the markdown content in this directory via
# MyST). Build with `make docs` — requires the [docs] extra
# (sphinx, myst-parser, sphinx-rtd-theme), which is not part of the runtime
# dependency set.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "tfimm-tpu"
author = "tfimm-tpu contributors"
copyright = "2026, tfimm-tpu contributors"

extensions = [
    "myst_parser",
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
exclude_patterns = ["_build"]

html_theme = "sphinx_rtd_theme"
autodoc_mock_imports = ["jax", "jaxlib", "optax", "orbax", "torch", "grain"]
