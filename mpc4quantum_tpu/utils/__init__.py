from .cxio import CxPair, split_cx, merge_cx, fetch_cx, cx_jit
from .linalg import (
    complex_to_real,
    real_to_complex,
    complex_to_real_op,
    real_to_complex_op,
    isqrt,
    split_blocks,
    default_cdtype,
    default_rdtype,
)
