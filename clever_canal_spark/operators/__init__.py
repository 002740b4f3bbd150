from .lww import lww_dedup, salted_lww_dedup

__all__ = ["lww_dedup", "salted_lww_dedup"]
