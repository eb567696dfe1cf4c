def glm(*a, **k):
    raise NotImplementedError("statsmodels shim")
