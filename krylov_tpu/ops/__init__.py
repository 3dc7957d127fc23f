from .sparse import CSROperator, DiaOperator

__all__ = ["CSROperator", "DiaOperator"]
