from .popcount import BitMatrix, masked_popcount_colsum  # noqa: F401
