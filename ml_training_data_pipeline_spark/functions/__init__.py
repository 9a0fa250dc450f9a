from . import analysis, text

__all__ = ["analysis", "text"]
