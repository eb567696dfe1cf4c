def _check_soft_dependencies(*args, **kwargs):
    # shim: report soft deps absent unless actually importable
    import importlib
    severity = kwargs.get("severity", "error")
    ok = True
    for dep in args:
        name = str(dep).split("<")[0].split(">")[0].split("=")[0].strip()
        try:
            importlib.import_module(name)
        except Exception:
            ok = False
    if not ok and severity == "error":
        raise ModuleNotFoundError(f"missing soft dependency: {args}")
    return ok
