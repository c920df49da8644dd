from . import linalg, nt_scaling, schur

__all__ = ["linalg", "nt_scaling", "schur"]
