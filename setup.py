"""Compat shim: all metadata lives in pyproject.toml.

Modern installs: ``pip install -e .``.  On environments whose pip cannot
build PEP-660 editable wheels (no ``wheel`` package, as in this sandbox),
``python setup.py develop --user`` produces the same editable install and
console scripts via plain setuptools.
"""

from setuptools import setup

setup()
