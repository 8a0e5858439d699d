"""Execute the notebooks/ tutorials in place (CPU backend) and save outputs.

The reference ships its notebooks with executed cells (e.g.
/root/reference/notebooks/tfimm-tutorial.ipynb, 46/48 executed); this runs
ours the same way. Each notebook's first code cell pins the CPU backend via
``jax.config.update`` — on this image the JAX_PLATFORMS env var is silently
ignored once the TPU plugin registers, so the pin must happen in-process
before backend init (see docs/profiling.md).

Run:  python scripts/run_notebooks.py [name.ipynb ...]
"""

import os
import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

_PIN = (
    "import jax\n"
    "\n"
    '# Tiny models throughout - CPU is fine; delete this line on a TPU VM\n'
    '# (the platform must be pinned BEFORE the first backend use).\n'
    'jax.config.update("jax_platforms", "cpu")\n'
)


def ensure_platform_pin(nb) -> bool:
    """Prepend the CPU pin to the first code cell if it isn't there."""
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        if 'jax.config.update("jax_platforms"' in cell.source:
            return False
        src = cell.source
        if src.startswith("import jax\n"):
            src = src[len("import jax\n"):].lstrip("\n")
        cell.source = _PIN + "\n" + src
        return True
    return False


def main():
    root = Path(__file__).resolve().parent.parent
    # The kernel is a child process: put the repo on its import path (the
    # package is used from the working tree, not installed).
    os.environ["PYTHONPATH"] = (
        str(root) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    names = sys.argv[1:] or sorted(
        p.name for p in (root / "notebooks").glob("*.ipynb"))
    for name in names:
        path = root / "notebooks" / name
        nb = nbformat.read(path, as_version=4)
        ensure_platform_pin(nb)
        print(f"executing {name} ...", flush=True)
        client = NotebookClient(
            nb, timeout=1800, kernel_name="python3",
            resources={"metadata": {"path": str(root / "notebooks")}})
        client.execute()
        nbformat.write(nb, path)
        n_exec = sum(1 for c in nb.cells
                     if c.cell_type == "code" and c.get("execution_count"))
        n_code = sum(1 for c in nb.cells if c.cell_type == "code")
        print(f"  {name}: {n_exec}/{n_code} code cells executed", flush=True)


if __name__ == "__main__":
    main()
