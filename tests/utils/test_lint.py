"""The AST lint fallback (scripts/lint.py) backs `make quality` when
pyflakes isn't installed — keep its checks honest."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "scripts"))

import lint  # noqa: E402


def _problems(tmp_path, src, name="mod.py"):
    f = tmp_path / name
    f.write_text(src)
    return [(ln, msg) for (_, ln, msg) in lint.check_file(f)]


def test_unused_import(tmp_path):
    probs = _problems(tmp_path, "import os\nimport sys\nprint(sys.path)\n")
    assert probs == [(1, "unused import 'os'")]


def test_future_and_noqa_exempt(tmp_path):
    src = ("from __future__ import annotations\n"
           "import os  # noqa: F401\n")
    assert _problems(tmp_path, src) == []


def test_attribute_use_counts(tmp_path):
    assert _problems(tmp_path, "import os.path\nprint(os.path.sep)\n") == []


def test_init_py_exempt(tmp_path):
    assert _problems(tmp_path, "import os\n", name="__init__.py") == []


def test_duplicate_def(tmp_path):
    probs = _problems(tmp_path, "def f():\n    pass\n\ndef f():\n    pass\n")
    assert any("redefinition of 'f'" in msg for _, msg in probs)


def test_decorated_redefinition_allowed(tmp_path):
    src = ("import functools\n"
           "@functools.lru_cache\n"
           "def f():\n    pass\n"
           "@functools.lru_cache\n"
           "def f():\n    pass\n")
    assert not any("redefinition" in m for _, m in _problems(tmp_path, src))


def test_none_comparison(tmp_path):
    probs = _problems(tmp_path, "x = 1\nprint(x == None)\n")
    assert any("comparison to None" in msg for _, msg in probs)


def test_fstring_without_placeholder(tmp_path):
    probs = _problems(tmp_path, "x = f'static'\n")
    assert any("f-string" in msg for _, msg in probs)


def test_format_spec_not_flagged(tmp_path):
    assert _problems(tmp_path, "y = 2.0\nx = f'{y:.4f}'\n") == []


def test_repo_is_clean():
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint.py"),
         "tfimm_tpu", "tests", "scripts"],
        cwd=REPO, capture_output=True, text=True)
    assert rc.returncode == 0, rc.stdout
