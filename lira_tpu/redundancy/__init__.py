from .assign import redundancy_rows, apply_redundancy, select_top_ratio

__all__ = ["redundancy_rows", "apply_redundancy", "select_top_ratio"]
