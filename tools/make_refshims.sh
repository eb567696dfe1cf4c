#!/bin/sh
# Recreate /tmp/refshims: import stubs (skbase + statsmodels) that let the
# READ-ONLY reference at /root/reference import in this environment.
# Usage:  sh tools/make_refshims.sh
# Then:   PYTHONPATH=/tmp/refshims:/root/reference python ...
set -e
mkdir -p /tmp/refshims/skbase/utils /tmp/refshims/statsmodels/formula
: > /tmp/refshims/skbase/__init__.py
: > /tmp/refshims/skbase/utils/__init__.py
cat > /tmp/refshims/skbase/utils/dependencies.py <<'EOF'
import importlib.util


def _check_soft_dependencies(packages, severity="error", *args, **kwargs):
    if isinstance(packages, str):
        packages = [packages]
    missing = [
        p
        for p in packages
        if importlib.util.find_spec(
            str(p).split("<")[0].split(">")[0].split("=")[0].strip()
        )
        is None
    ]
    if not missing:
        return True
    if severity == "error":
        raise ModuleNotFoundError(f"missing soft dependencies: {missing}")
    return False
EOF
: > /tmp/refshims/statsmodels/__init__.py
cat > /tmp/refshims/statsmodels/api.py <<'EOF'
class _Unavailable:
    def __init__(self, *a, **k):
        raise ImportError("statsmodels stub: not available in this environment")


OLS = GLS = WLS = _Unavailable


def add_constant(x, *a, **k):
    import numpy as np

    if hasattr(x, "insert"):
        x = x.copy()
        x.insert(0, "const", 1.0)
        return x
    x = np.asarray(x)
    return np.column_stack([np.ones(len(x)), x])
EOF
: > /tmp/refshims/statsmodels/formula/__init__.py
cat > /tmp/refshims/statsmodels/formula/api.py <<'EOF'
def __getattr__(name):
    raise ImportError("statsmodels stub: formula api not available")
EOF
echo "refshims ready at /tmp/refshims"
