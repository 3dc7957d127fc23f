"""Analysis utilities (L4). Populated incrementally; see reference src/krylov/utils.py."""

__all__ = []
