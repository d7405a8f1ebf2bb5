from .pallas_leapfrog import make_gaussian_fused_leapfrog

__all__ = ["make_gaussian_fused_leapfrog"]
