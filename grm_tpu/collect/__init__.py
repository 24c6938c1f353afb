from .amr import AmrDatabase  # noqa: F401
