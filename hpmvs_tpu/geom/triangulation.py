"""Midpoint triangulation of a ray bundle.

Equivalent of TriangulateMidpoint (include/hpmvs/Triangulation.hpp:29-53):
least-squares point minimizing distance to all rays via the 4x4 normal
equations. Used only for the scene-center sphere filter, so it stays a tiny
host-side numpy routine.
"""

from __future__ import annotations

import numpy as np


def triangulate_midpoint(origins: np.ndarray, directions: np.ndarray) -> np.ndarray:
    """origins (N,3), directions (N,3) unit. Returns the midpoint (3,)."""
    assert origins.shape == directions.shape and origins.shape[0] >= 2
    A = np.zeros((4, 4), dtype=np.float64)
    b = np.zeros((4,), dtype=np.float64)
    for o, d in zip(origins, directions):
        d = d / np.linalg.norm(d)
        cost = np.eye(3) - np.outer(d, d)
        Ah = np.zeros((3, 4))
        Ah[:, :3] = cost
        Ah[:, 3] = -cost @ o
        A += Ah.T @ Ah
    # solve A x = 0 with x = (p, 1): take the 3x3 block system
    M = A[:3, :3]
    rhs = -A[:3, 3]
    p = np.linalg.lstsq(M, rhs, rcond=None)[0]
    return p
