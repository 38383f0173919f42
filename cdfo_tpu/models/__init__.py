from .cvsr import CVSRV8, make_model

__all__ = ["CVSRV8", "make_model"]
