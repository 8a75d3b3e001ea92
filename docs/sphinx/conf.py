# Sphinx configuration for nnaudio_tpu.
#
# The build image this project is developed in has no network access and no
# Sphinx install, so this tree is CI/host material: `pip install sphinx
# furo myst-parser && sphinx-build -b html docs/sphinx docs/_build` renders
# the full API from the package's NumPy-style docstrings (every transform
# class carries reference-depth Parameters/Returns/Examples sections) plus
# the two design documents (docs/api.md, docs/kernels.md).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "nnaudio_tpu"
copyright = "2026, nnaudio_tpu contributors"
author = "nnaudio_tpu contributors"

try:
    from importlib.metadata import version as _v

    release = _v("nnaudio-tpu")
except Exception:  # pragma: no cover - source tree build
    release = "0.3.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
    "myst_parser",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = []  # jax/numpy are hard requirements; no mocks

napoleon_numpy_docstring = True
napoleon_google_docstring = False

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
templates_path = []
exclude_patterns = []

html_theme = "furo"
