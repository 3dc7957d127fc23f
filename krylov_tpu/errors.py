class ArgumentError(Exception):
    """Raised when an argument is invalid.

    Kept distinct from ``ValueError`` so that library errors can be told apart
    from built-in ones.  Capability parity with the reference exception type
    (reference: src/krylov/errors.py:1-9).
    """
