from .registry import Registry
from .tensors import batch_broadcast

__all__ = ["Registry", "batch_broadcast"]

# metrics / inference / graphics are imported lazily by consumers to keep
# `import storm_tpu` light (scipy.stats, matplotlib are heavy).
