from .registry import get_loader, get_eval_loader

__all__ = ["get_loader", "get_eval_loader"]
