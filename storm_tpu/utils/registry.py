"""Name -> class registries with decorator-based registration.

Same contract as the reference registry (sgmse/util/registry.py:5-34): used for
backbones, SDEs, predictors and correctors so CLIs can dispatch on
``--backbone ncsnpp`` style flags.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List


class Registry:
    def __init__(self, managed_thing: str):
        """Create a new registry.

        Args:
            managed_thing: a description of the things being registered, for
                nicer error messages.
        """
        self.managed_thing = managed_thing
        self._registry: Dict[str, Any] = {}

    def register(self, name: str) -> Callable[[Any], Any]:
        def inner_wrapper(wrapped_class):
            if name in self._registry:
                raise ValueError(
                    f"{self.managed_thing} {name} already registered!"
                )
            self._registry[name] = wrapped_class
            return wrapped_class

        return inner_wrapper

    def get_by_name(self, name: str) -> Any:
        """Get a managed thing by name."""
        if name in self._registry:
            return self._registry[name]
        raise ValueError(
            f"{self.managed_thing} with name '{name}' unknown! "
            f"Available: {sorted(self._registry)}"
        )

    def get_all_names(self) -> List[str]:
        """Get the list of things' names registered to this registry."""
        return list(self._registry.keys())
