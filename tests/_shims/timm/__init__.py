"""Minimal timm shim for importing /root/reference (test-only).

The reference's gvt.py needs exactly three symbols from timm
(`DropPath`, `to_2tuple`, `trunc_normal_`) plus the classic
`timm.models.vision_transformer.Block` layout (norm1/attn/drop_path/
norm2/mlp with fc1-fc2 Mlp and fused-qkv Attention). timm is not
installed in this image; this shim provides torch implementations with
IDENTICAL parameter names so reference state_dicts keep their key
layout. Only used by the reference-parity tests.
"""

from timm import models  # noqa: F401
