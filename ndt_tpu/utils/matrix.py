"""Dense matrix routines (matrix.{h,c} rebuild).

The reference carries its own row-major double matrix library: multiply,
transpose, Gaussian-elimination solve, LU decompose/solve, inverse,
determinant (matrix.c:77-597).  Production code only exercises the Givens
rotation inside vectNd_rotate and the least-squares solve inside texture
mapping (map.c:51-61), but the API is public, so it's rebuilt here with the
same algorithms (partial-pivot elimination, Doolittle LU) over numpy storage
-- including the embedded self-tests (matrix_test_solve{,2,3},
matrix.c:398-528) which run as unit tests in tests/test_utils_matrix.py.
"""

from __future__ import annotations

import numpy as np


def identity(n: int) -> np.ndarray:
    return np.eye(n, dtype=np.float64)


def mult(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """matrix_mult (matrix.c:98-118)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch {a.shape} x {b.shape}")
    return a @ b


def transpose(a: np.ndarray) -> np.ndarray:
    return np.asarray(a, dtype=np.float64).T.copy()


def gauss_elim_solve(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Gaussian elimination with partial pivoting (matrix_gauss_elim,
    matrix.c:166-263): solves A x = b."""
    a = np.array(a, dtype=np.float64, copy=True)
    b = np.array(b, dtype=np.float64, copy=True).reshape(-1)
    n = a.shape[0]
    if a.shape[1] != n or b.shape[0] != n:
        raise ValueError("need square A and matching b")
    for col in range(n):
        pivot = col + int(np.argmax(np.abs(a[col:, col])))
        if abs(a[pivot, col]) < 1e-300:
            raise np.linalg.LinAlgError("singular matrix")
        if pivot != col:
            a[[col, pivot]] = a[[pivot, col]]
            b[[col, pivot]] = b[[pivot, col]]
        for row in range(col + 1, n):
            f = a[row, col] / a[col, col]
            a[row, col:] -= f * a[col, col:]
            b[row] -= f * b[col]
    x = np.zeros(n)
    for row in range(n - 1, -1, -1):
        x[row] = (b[row] - a[row, row + 1:] @ x[row + 1:]) / a[row, row]
    return x


def lu_decompose(a: np.ndarray):
    """Doolittle LU without pivoting (matrix_lu_decompose,
    matrix.c:265-340): returns (L, U) with unit-diagonal L."""
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    L = np.eye(n)
    U = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            U[i, j] = a[i, j] - L[i, :i] @ U[:i, j]
        for j in range(i + 1, n):
            L[j, i] = (a[j, i] - L[j, :i] @ U[:i, i]) / U[i, i]
    return L, U


def lu_solve(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """matrix_lu_solve (matrix.c:342-377): forward+back substitution."""
    L, U = lu_decompose(a)
    b = np.asarray(b, dtype=np.float64).reshape(-1)
    n = len(b)
    y = np.zeros(n)
    for i in range(n):
        y[i] = b[i] - L[i, :i] @ y[:i]
    x = np.zeros(n)
    for i in range(n - 1, -1, -1):
        x[i] = (y[i] - U[i, i + 1:] @ x[i + 1:]) / U[i, i]
    return x


def invert(a: np.ndarray) -> np.ndarray:
    """matrix_invert (matrix.c:529-585): solve against identity columns."""
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    cols = [gauss_elim_solve(a, np.eye(n)[:, k]) for k in range(n)]
    return np.stack(cols, axis=1)


def det(a: np.ndarray) -> float:
    """matrix_det via LU product of U's diagonal (matrix.c:587-...)."""
    _, U = lu_decompose(np.asarray(a, dtype=np.float64))
    return float(np.prod(np.diag(U)))


def rotation(n: int, i: int, j: int, angle: float) -> np.ndarray:
    """The Givens rotation vectNd_rotate builds (vectNd.c:233-239)."""
    m = identity(n)
    c, s = np.cos(angle), np.sin(angle)
    m[i, i] = c
    m[i, j] = -s
    m[j, i] = s
    m[j, j] = c
    return m
