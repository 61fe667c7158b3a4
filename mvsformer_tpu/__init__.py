"""TPU-native multi-view stereo framework (MVSFormer capabilities, JAX/XLA/Pallas)."""

__version__ = "0.1.0"
