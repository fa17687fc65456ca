"""Doctests as a first-class test layer (the reference runs doctest.testmod
over every module of every package — SURVEY §4.1). Modules with numeric
examples in their docstrings are exercised here."""

import doctest

import pytest

import pyphysim_tpu.channels.noise
import pyphysim_tpu.extra.matlab
import pyphysim_tpu.reference_signals.zadoffchu
import pyphysim_tpu.utils.conversion
import pyphysim_tpu.utils.misc

MODULES = [
    pyphysim_tpu.utils.conversion,
    pyphysim_tpu.utils.misc,
    pyphysim_tpu.reference_signals.zadoffchu,
    pyphysim_tpu.extra.matlab,
    pyphysim_tpu.channels.noise,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
