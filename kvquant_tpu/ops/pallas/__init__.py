from .attention import qk_fused, pv_fused

__all__ = ["qk_fused", "pv_fused"]
