"""Raise-on-use shim: reference imports names at module scope (GLS, OLS,
add_constant); the discrete golden paths never instantiate them."""


class _Unavailable:
    def __init__(self, *a, **k):
        raise NotImplementedError("statsmodels shim")


def __getattr__(name):
    if name.startswith("__"):
        raise AttributeError(name)
    return _Unavailable


def add_constant(*a, **k):
    raise NotImplementedError("statsmodels shim")
