"""Smallest Lanczos example: 3x3 dense matrix via a matmul lambda.

Mirrors reference sample_lanczos1.cpp:13-41 (a 3x3 matrix with known
spectrum, operator given as a bare mat-mul function)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax.numpy as jnp
import numpy as np

import eigenex_tpu as ex

A = jnp.asarray([[2.0, -1.0, 0.0], [-1.0, 2.0, -1.0], [0.0, -1.0, 2.0]])

# matrix-free: the solver only ever sees the callable (cf. MatMulFunction)
op = ex.aslinearoperator(lambda x: A @ x, shape=(3, 3), dtype=A.dtype)

solver = ex.LanczosEigenSolver(op, ex.LanczosOptions(max_eigenvalues=3, max_subspace=3))
res = solver.compute()

print("eigenvalues:", res.eigenvalues)
print("exact      :", np.array([2 - np.sqrt(2), 2.0, 2 + np.sqrt(2)]))
print("eigenvectors (columns):")
print(np.asarray(res.eigenvectors))
print("termination:", res.termination)
