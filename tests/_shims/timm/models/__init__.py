from timm.models import layers, vision_transformer  # noqa: F401
