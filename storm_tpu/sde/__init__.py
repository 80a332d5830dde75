from .sdes import SDERegistry, OUVESDE, OUVPSDE, ReverseSDE

__all__ = ["SDERegistry", "OUVESDE", "OUVPSDE", "ReverseSDE"]
