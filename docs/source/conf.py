# Sphinx configuration for baryonforge-tpu.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "baryonforge-tpu"
author = "baryonforge-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = []          # jax/numpy are real dependencies

napoleon_google_docstring = True
napoleon_numpy_docstring = True

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "alabaster"
