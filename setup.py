"""Packaging shim (reference analog: ``setup.py`` which cythonized
rank_cylib; our native ranking library builds itself via g++ on first use —
see ieee_tpu/native/ranking/__init__.py)."""

from setuptools import setup

setup()
