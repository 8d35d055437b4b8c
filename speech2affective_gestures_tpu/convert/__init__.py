from . import torch_ckpt  # noqa: F401
