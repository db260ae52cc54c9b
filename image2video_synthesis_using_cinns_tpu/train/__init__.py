from .optim import adam_torch, LRController

__all__ = ["adam_torch", "LRController"]
