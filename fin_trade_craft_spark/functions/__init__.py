from .exact import davg, dsum, with_share_of_total

__all__ = ["davg", "dsum", "with_share_of_total"]
