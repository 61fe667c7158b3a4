def make_grid(*a, **k):  # only referenced, never called, in parity tests
    raise NotImplementedError("torchvision shim: make_grid not implemented")
