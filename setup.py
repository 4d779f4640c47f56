"""Shim for legacy editable installs (`pip install -e . --no-use-pep517`)
on environments whose setuptools lacks the PEP 660 wheel hook (the
sandbox ships setuptools 65 without `wheel`). All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
