# numba stub for running the read-only reference in comparisons:
# vectorize falls back to numpy.frompyfunc
import numpy as np

def vectorize(sigs=None, **kw):
    if callable(sigs):  # used as a bare decorator
        fn = sigs
        import numpy as _np
        uf = _np.frompyfunc(fn, fn.__code__.co_argcount, 1)
        return lambda *a: uf(*a).astype(_np.int64)
    def deco(fn):
        uf = np.frompyfunc(fn, fn.__code__.co_argcount, 1)
        def wrapper(*args):
            out = uf(*args)
            return out.astype(np.int64) if hasattr(out, 'astype') else out
        return wrapper
    return deco

def jit(*a, **k):
    if len(a) == 1 and callable(a[0]):
        return a[0]
    def deco(fn):
        return fn
    return deco
njit = jit
