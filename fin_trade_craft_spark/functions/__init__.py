from .exact import davg, dsum, share_of_total

__all__ = ["davg", "dsum", "share_of_total"]
