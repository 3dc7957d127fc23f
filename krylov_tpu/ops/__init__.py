from .sparse import CSROperator, DiaOperator
from .stencil import (
    BandedOperator,
    GridStencilOperator,
    poisson_1d,
    poisson_2d,
    poisson_3d,
)

__all__ = [
    "CSROperator",
    "DiaOperator",
    "BandedOperator",
    "GridStencilOperator",
    "poisson_1d",
    "poisson_2d",
    "poisson_3d",
]
