"""Backbone registry and backbone families.

Mirrors the reference registry surface (sgmse/backbones/__init__.py,
sgmse/backbones/shared.py:11): names `ncsnpp`, `ncsnpplarge`, `ncsnpp12M`,
`ncsnpp6M`, `ae-ncsnpp`, `convtasnet`, `gagnet`.
"""
from ..utils import Registry

BackboneRegistry = Registry("Backbone")

from . import ncsnpp  # noqa: E402,F401  (registers ncsnpp variants)
from . import convtasnet  # noqa: E402,F401
from . import gagnet  # noqa: E402,F401

__all__ = ["BackboneRegistry", "ncsnpp", "convtasnet", "gagnet"]
