from . import np_oracle

__all__ = ["np_oracle"]
