# Sphinx configuration (myst markdown sources, furo theme) — mirrors the
# reference's docs build (docs/source/conf.py upstream).
project = "fastselect-tpu"
author = "fastselect-tpu developers"
release = "0.1.0"

extensions = [
    "myst_parser",
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
html_theme = "furo"
exclude_patterns = ["_build"]
