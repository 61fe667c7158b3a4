"""Minimal omegaconf shim (test-only): referenced by /root/reference/utils.py
only inside get_config (utils.py:394), which parity tests never call."""


class OmegaConf:
    @staticmethod
    def load(path):
        raise NotImplementedError("omegaconf shim")

    @staticmethod
    def to_container(cfg):
        raise NotImplementedError("omegaconf shim")
