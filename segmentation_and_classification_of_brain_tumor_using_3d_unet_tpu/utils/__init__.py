from . import visualization

__all__ = ["visualization"]
