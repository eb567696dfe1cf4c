"""Programmatic signature diff vs the live reference.

Run with: PYTHONPATH=/root/repo/tools/refshims:/root/reference:/root/repo python tools/sig_sweep.py

VERDICT r3 item 5 acceptance: must print TOTALS: classes=0 methods=0 params=0.
Reports missing classes, missing methods, and missing parameters in every
shared public namespace."""
import importlib
import inspect
import sys

import jax
jax.config.update("jax_platforms", "cpu")

NAMESPACES = [
    ("pgmpy.base", "pgmpy_tpu.base"),
    ("pgmpy.models", "pgmpy_tpu.models"),
    ("pgmpy.factors.discrete", "pgmpy_tpu.factors"),
    ("pgmpy.factors.continuous", "pgmpy_tpu.factors"),
    ("pgmpy.factors.hybrid", "pgmpy_tpu.factors"),
    ("pgmpy.factors", "pgmpy_tpu.factors"),
    ("pgmpy.inference", "pgmpy_tpu.inference"),
    ("pgmpy.sampling", "pgmpy_tpu.sampling"),
    ("pgmpy.estimators", "pgmpy_tpu.estimators"),
    ("pgmpy.metrics", "pgmpy_tpu.metrics"),
    ("pgmpy.readwrite", "pgmpy_tpu.readwrite"),
    ("pgmpy.utils", "pgmpy_tpu.utils"),
    ("pgmpy.independencies", "pgmpy_tpu.independencies"),
]

missing_classes, missing_methods, missing_params = [], [], []
import_failures, kwargs_skipped = [], []

for ref_name, ours_name in NAMESPACES:
    try:
        ref = importlib.import_module(ref_name)
        ours = importlib.import_module(ours_name)
    except Exception as e:
        print(f"IMPORT FAIL {ref_name} / {ours_name}: {e}")
        import_failures.append(ref_name)
        continue
    for cls_name in getattr(ref, "__all__", dir(ref)):
        if cls_name.startswith("_"):
            continue
        ref_obj = getattr(ref, cls_name, None)
        if ref_obj is None:
            continue
        our_obj = getattr(ours, cls_name, None)
        if our_obj is None:
            if inspect.isclass(ref_obj) or inspect.isfunction(ref_obj):
                missing_classes.append(f"{ref_name}.{cls_name}")
            continue
        if inspect.isfunction(ref_obj):
            try:
                rp = set(inspect.signature(ref_obj).parameters)
                op = set(inspect.signature(our_obj).parameters)
            except (ValueError, TypeError):
                continue
            if "kwargs" in op or "kwargs" in rp:
                kwargs_skipped.append(f"{ref_name}.{cls_name}")
                continue
            lost = rp - op - {"self", "n_jobs", "show_progress"}
            if lost:
                missing_params.append(f"{ref_name}.{cls_name}: {sorted(lost)}")
            continue
        if not inspect.isclass(ref_obj):
            continue
        for m_name, ref_m in inspect.getmembers(ref_obj):
            if m_name.startswith("_") or not (
                inspect.isfunction(ref_m) or isinstance(ref_m, property)
            ):
                continue
            our_m = getattr(our_obj, m_name, None)
            if our_m is None:
                missing_methods.append(f"{cls_name}.{m_name}")
                continue
            if isinstance(ref_m, property) or not inspect.isfunction(ref_m):
                continue
            try:
                rp = set(inspect.signature(ref_m).parameters)
                op = set(inspect.signature(our_m).parameters)
            except (ValueError, TypeError):
                continue
            if "kwargs" in op:
                op |= rp  # **kwargs absorbs anything
            lost = rp - op - {"self", "n_jobs", "show_progress", "kwargs", "args"}
            if lost:
                missing_params.append(f"{cls_name}.{m_name}: {sorted(lost)}")

print("== missing classes ==")
for x in sorted(set(missing_classes)):
    print(" ", x)
print("== missing methods ==")
for x in sorted(set(missing_methods)):
    print(" ", x)
print("== missing params ==")
for x in sorted(set(missing_params)):
    print(" ", x)
print("== **kwargs-skipped functions (param sets not compared) ==")
for x in sorted(set(kwargs_skipped)):
    print(" ", x)
print(
    f"TOTALS: classes={len(set(missing_classes))} methods={len(set(missing_methods))} params={len(set(missing_params))}"
    f" kwargs_skipped={len(set(kwargs_skipped))}"
)
# the parity gate must fail loudly, not report vacuous success, when the
# reference (or our package) cannot even be imported
if import_failures:
    print(f"FAIL: {len(import_failures)} namespace import failure(s): "
          + ", ".join(import_failures))
    sys.exit(1)
if missing_classes or missing_methods or missing_params:
    sys.exit(2)
