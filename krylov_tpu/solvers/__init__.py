from .cg import cg
from .gmres import gmres
from .minres import minres

__all__ = ["cg", "gmres", "minres"]
