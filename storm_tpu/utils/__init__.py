from .registry import Registry
from .tensors import batch_broadcast

__all__ = ["Registry", "batch_broadcast"]
