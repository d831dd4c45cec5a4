from .scan import linear_scan, selective_scan
from .cross_scan import cross_scan, cross_merge
from .wavelet import dwt2, iwt2
from .quaternion import hamilton_product, rgb_to_quaternions

__all__ = [
    "linear_scan",
    "selective_scan",
    "cross_scan",
    "cross_merge",
    "dwt2",
    "iwt2",
    "hamilton_product",
    "rgb_to_quaternions",
]
