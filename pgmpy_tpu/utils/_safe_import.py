"""Soft-dependency import helper.

Parity: ``/root/reference/pgmpy/utils/_safe_import.py``.
"""

import importlib

from pgmpy_tpu.config import logger


class _MissingModule:
    def __init__(self, name, message=None):
        self._name = name
        self._message = message

    def __getattr__(self, attr):
        raise ModuleNotFoundError(
            self._message or f"Optional dependency '{self._name}' is not installed."
        )

    def __call__(self, *args, **kwargs):
        raise ModuleNotFoundError(
            self._message or f"Optional dependency '{self._name}' is not installed."
        )


def _safe_import(module_name, attribute=None, message=None):
    """Import a module (or attribute) returning a raising stub when the
    dependency is missing."""
    try:
        module = importlib.import_module(module_name)
    except ImportError:
        return _MissingModule(module_name, message)
    if attribute is not None:
        return getattr(module, attribute)
    return module


def _check_soft_dependencies(*packages, severity="error", msg=None):
    missing = []
    for pkg in packages:
        name = pkg.split("<")[0].split(">")[0].split("=")[0].strip()
        try:
            importlib.import_module(name)
        except ImportError:
            missing.append(name)
    if missing:
        if severity == "error":
            raise ModuleNotFoundError(msg or f"Missing soft dependencies: {missing}")
        logger.warning(msg or f"Missing soft dependencies: {missing}")
        return False
    return True
