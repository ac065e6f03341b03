from . import fermion

__all__ = ["fermion"]
