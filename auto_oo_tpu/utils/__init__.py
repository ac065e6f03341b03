from .newton_raphson import NewtonStep
from .misc import get_formal_geo
from .checkpoint import save_state, load_state, resume
from .observe import Monitor

__all__ = ["NewtonStep", "get_formal_geo", "save_state", "load_state",
           "resume", "Monitor"]
