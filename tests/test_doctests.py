"""Doctests as a first-class test layer: the reference runs
doctest.testmod over EVERY module of every package (SURVEY §4.1, e.g.
tests/simulations_package_test.py:71-102). We walk the whole
pyphysim_tpu tree; modules without examples pass trivially."""

import doctest
import importlib
import pkgutil

import pytest

import pyphysim_tpu


def _iter_module_names():
    names = []
    for mod in pkgutil.walk_packages(pyphysim_tpu.__path__,
                                     prefix="pyphysim_tpu."):
        names.append(mod.name)
    return sorted(names)


@pytest.mark.parametrize("name", _iter_module_names())
def test_doctests(name):
    module = importlib.import_module(name)
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
