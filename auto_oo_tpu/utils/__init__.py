from .newton_raphson import NewtonStep
from .misc import get_formal_geo

__all__ = ["NewtonStep", "get_formal_geo"]
