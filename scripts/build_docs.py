"""Static HTML docs builder — the no-Sphinx fallback for `make docs`.

Renders every `docs/*.md` page to `docs/_build/html/` with the `markdown`
package (fenced code + tables + pygments highlighting) and a small sidebar
navigation generated from docs/index.md. When sphinx + myst-parser are
installed, `make docs` uses the real Sphinx build instead (docs/conf.py);
this script exists so the documentation is buildable in minimal
environments, mirroring the role of the reference's RTD build
(reference: docs/source/conf.py).
"""

import html
import inspect
import pathlib
import re
import shutil
import sys

import markdown

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ROOT / "docs"
OUT = DOCS / "_build" / "html"

# Public API surface rendered into the generated api.md page, mirroring the
# reference's per-module RTD pages (docs/source/content/api/*).
API_MODULES = [
    ("tfimm_tpu", ["create_model", "create_preprocessing", "list_models",
                   "list_modules", "register_model", "transfer_weights",
                   "get_dir", "set_dir", "set_model_cache",
                   "clear_model_cache", "cached_model_path",
                   "list_cached_models"]),
    ("tfimm_tpu.models", ["ModelConfig", "Model", "EmbeddingModel",
                          "save_model", "load_model"]),
    ("tfimm_tpu.ops", ["MLP", "ConvMLP", "GluMLP", "GatedMLP",
                       "PatchEmbeddings", "ClassifierHead", "SEModule",
                       "EcaModule", "BlurPool2d", "StdConv2d",
                       "interpolate_pos_embeddings",
                       "interpolate_pos_embeddings_grid",
                       "act_layer_factory", "norm_layer_factory",
                       "attn_layer_factory"]),
    ("tfimm_tpu.ops.attention", ["scaled_dot_product_attention",
                                 "MultiHeadAttention"]),
    ("tfimm_tpu.architectures.lora", ["create_model", "convert_to_lora_model",
                                      "convert_to_regular_model",
                                      "merge_lora_weights",
                                      "lora_trainable_weights",
                                      "register_lora_architecture"]),
    ("tfimm_tpu.architectures.segment_anything", [
        "SegmentAnythingModel", "SAMPredictor", "ImageResizer",
        "SAMAutomaticMaskGenerator"]),
    ("tfimm_tpu.parallel", ["create_mesh", "infer_param_sharding",
                            "fsdp_param_sharding", "batch_sharding",
                            "opt_state_sharding", "make_train_step",
                            "make_eval_step"]),
    ("tfimm_tpu.train", ["run", "ExperimentConfig", "Trainer",
                         "TrainerConfig", "ProblemBase", "Timekeeping"]),
    ("tfimm_tpu.utils.profile", ["time_model", "find_max_batch_size"]),
    ("tfimm_tpu.utils.flops", ["get_flops", "get_parameters"]),
]


def _api_markdown() -> str:
    """Signatures + first docstring paragraphs for the public API."""
    sys.path.insert(0, str(ROOT))
    lines = ["# API reference", "",
             "Generated from the installed package by `scripts/build_docs.py`.",
             ""]
    import importlib

    for mod_name, names in API_MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except Exception as exc:  # soft-dep module missing in this env
            lines += [f"## `{mod_name}`", "", f"*(not importable here: {exc})*",
                      ""]
            continue
        lines += [f"## `{mod_name}`", ""]
        for name in names:
            obj = getattr(mod, name, None)
            if obj is None:
                continue
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = ""
            doc = inspect.getdoc(obj) or ""
            first = doc.split("\n\n")[0].replace("\n", " ") if doc else ""
            lines += [f"### `{name}{sig}`", ""]
            if first:
                lines += [first, ""]
    return "\n".join(lines)

PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — tfimm-tpu</title>
<style>
body {{ margin: 0; font: 16px/1.55 -apple-system, "Segoe UI", Roboto, sans-serif;
       color: #1a1a1a; }}
.layout {{ display: flex; min-height: 100vh; }}
nav {{ width: 230px; flex-shrink: 0; background: #f4f4f5; padding: 1.2rem 1rem;
      border-right: 1px solid #e4e4e7; }}
nav a {{ display: block; padding: .25rem 0; color: #3f3f46;
        text-decoration: none; }}
nav a.current {{ font-weight: 600; color: #0f766e; }}
nav a:hover {{ color: #0f766e; }}
main {{ max-width: 46rem; padding: 1.5rem 2.5rem 4rem; min-width: 0; }}
pre {{ background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: 14px; }}
code {{ font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
       font-size: .92em; }}
:not(pre) > code {{ background: #f1f1f2; padding: .1em .3em;
                    border-radius: 4px; }}
table {{ border-collapse: collapse; display: block; overflow-x: auto; }}
th, td {{ border: 1px solid #d4d4d8; padding: .35rem .6rem;
         text-align: left; }}
th {{ background: #fafafa; }}
h1, h2, h3 {{ line-height: 1.25; }}
a {{ color: #0f766e; }}
{pygments}
</style>
</head>
<body>
<div class="layout">
<nav>
<p style="font-weight:700; margin-top:0"><a href="index.html"
   style="color:#1a1a1a">tfimm-tpu</a></p>
{nav}
</nav>
<main>
{body}
</main>
</div>
</body>
</html>
"""


def _pygments_css() -> str:
    try:
        from pygments.formatters import HtmlFormatter

        return HtmlFormatter(style="default").get_style_defs(".codehilite")
    except Exception:
        return ""


def _nav_entries(index_text: str):
    """Page order from the markdown link list in index.md."""
    entries = [("index.md", "Overview")]
    for match in re.finditer(r"^- \[([^\]]+)\]\(([^)]+\.md)\)", index_text,
                             re.MULTILINE):
        entries.append((match.group(2), match.group(1)))
    listed = {name for name, _ in entries}
    for page in sorted(DOCS.glob("*.md")):
        if page.name not in listed:
            title = page.name[:-3].replace("_", " ").title()
            entries.append((page.name, title))
    return entries


def _all_pages(entries):
    """Every markdown page under docs/ (subdirectories included, _build
    excluded), titled from the nav when listed there."""
    titles = dict((n, t) for n, t in entries)
    pages = []
    for page in sorted(DOCS.rglob("*.md")):
        rel = page.relative_to(DOCS).as_posix()
        if rel.startswith("_build"):
            continue
        default = page.stem.replace("_", " ").title()
        pages.append((rel, titles.get(rel, default)))
    return pages


def build() -> int:
    if not DOCS.is_dir():
        print(f"docs directory not found: {DOCS}", file=sys.stderr)
        return 1
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)

    index_text = (DOCS / "index.md").read_text()
    entries = _nav_entries(index_text)
    try:
        api_md = _api_markdown()
    except Exception as exc:
        api_md = f"# API reference\n\n*(generation failed: {exc})*\n"
    entries.append(("api.md", "API reference"))
    pygments = _pygments_css()

    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    pages = _all_pages(entries) + [("api.md", "API reference")]
    for name, title in pages:
        text = api_md if name == "api.md" else (DOCS / name).read_text()
        # Strip MyST toctree directives — navigation is the sidebar here.
        text = re.sub(r"```\{toctree\}.*?```", "", text, flags=re.DOTALL)
        md.reset()
        body = md.convert(text)
        # .md links -> .html so pages cross-link inside the build.
        body = re.sub(r'href="([\w./-]+)\.md(#[\w-]*)?"',
                      r'href="\1.html\2"', body)
        depth = name.count("/")
        up = "../" * depth
        nav = "\n".join(
            f'<a href="{up}{n[:-3]}.html"'
            + (' class="current"' if n == name else "")
            + f">{html.escape(t)}</a>"
            for n, t in entries
        )
        out_path = OUT / (name[:-3] + ".html")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(
            PAGE.format(title=html.escape(title), nav=nav, body=body,
                        pygments=pygments)
        )
        print(f"  wrote {name[:-3] + '.html'}")
    print(f"Docs built at {OUT}/index.html ({len(pages)} pages)")
    return 0


if __name__ == "__main__":
    sys.exit(build())
