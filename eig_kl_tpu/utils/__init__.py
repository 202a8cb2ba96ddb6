from eig_kl_tpu.utils.config import KLConfig, SpectralConfig

__all__ = ["KLConfig", "SpectralConfig"]
