"""Minimal torchvision shim (test-only): just enough for `import utils` in
/root/reference (utils.py:11 `import torchvision.utils as vutils`, used only
for TensorBoard image grids we never call in parity tests)."""
from torchvision import utils, transforms  # noqa: F401
