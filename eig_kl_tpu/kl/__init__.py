from eig_kl_tpu.kl.engine import KLResult, refine, kl_step
from eig_kl_tpu.kl.init import random_split, split_from_eig, sides_balance

__all__ = ["KLResult", "refine", "kl_step", "random_split", "split_from_eig", "sides_balance"]
