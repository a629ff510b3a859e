"""Inter-scale regularization weights for cross-scale aggregation.

The CVPR'14 cross-scale consistency objective has the closed-form solution of
a (I + lambda*L) tridiagonal system over scales; the reference materializes
the matrix with diagonal 1+lambda (ends) / 1+2*lambda (middle) and -lambda
off-diagonals, inverts it, and uses row 0 as the per-scale weights
(pre_cs_pc.cc:88-109).  The matrix is scale_num x scale_num (5x5 by default),
so this is a one-time numpy-sized setup computation.
"""

from __future__ import annotations

import numpy as np


def scale_weights(scale_num: int, reg_lambda: float) -> np.ndarray:
    """Row 0 of (I + lambda*L)^-1 for the path-graph Laplacian over scales.

    Returns:
      f32[scale_num] weights; [1, 0, ..., 0] when reg_lambda == 0.
    """
    m = np.zeros((scale_num, scale_num), np.float64)
    for s in range(scale_num):
        ends = s == 0 or s == scale_num - 1
        m[s, s] = 1.0 + (reg_lambda if ends else 2.0 * reg_lambda)
        if s > 0:
            m[s, s - 1] = -reg_lambda
        if s < scale_num - 1:
            m[s, s + 1] = -reg_lambda
    inv = np.linalg.inv(m)
    return inv[0].astype(np.float32)
