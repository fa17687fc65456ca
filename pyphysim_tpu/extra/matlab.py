"""MATLAB array export
(parity: pyphysim/extra/MATLAB/python2MATLAB.py:9-40)."""

from __future__ import annotations

import numpy as np

__all__ = ["to_mat_str"]


def to_mat_str(x: np.ndarray, format_string: str = "+.12e") -> str:
    """String representation of an array pasteable into MATLAB:
    ``[a, b; c, d]`` with ';' separating rows."""
    x = np.atleast_2d(np.asarray(x))
    if x.ndim > 2:
        raise ValueError("to_mat_str only supports 1D and 2D arrays")

    def fmt(v) -> str:
        if np.iscomplexobj(x):
            return (f"{v.real:{format_string}}{v.imag:+{format_string.lstrip('+')}}j"
                    .replace("j", "j"))
        return f"{v:{format_string}}"

    rows = [", ".join(fmt(v) for v in row) for row in x]
    return "[" + "; ".join(rows) + "]"
