"""DTensor: label-driven tensor algebra (dynamic rank).

The completed intent of the reference's unfinished DTensor framework
(multi_indices.hpp:982-1440): axes addressed by NAME, contraction/outer
products/diagonals driven by labels, one fused XLA op per expression.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from eigenex_tpu import dtensor

rng = np.random.default_rng(0)
A = dtensor(jnp.asarray(rng.standard_normal((3, 4))), ("i", "j"))
B = dtensor(jnp.asarray(rng.standard_normal((4, 5))), ("j", "k"))

print(A, "x", B)
C = A.contract(B)  # sums shared label j -> ("i", "k")
print("contract:", C)
assert np.allclose(np.asarray(C.to_array()), np.asarray(A.data) @ np.asarray(B.data))

# batch label: kept by naming it in the output
X = dtensor(jnp.asarray(rng.standard_normal((6, 3, 4))), ("b", "i", "j"))
Y = dtensor(jnp.asarray(rng.standard_normal((6, 4, 2))), ("b", "j", "k"))
Z = X.contract(Y, out_labels=("b", "i", "k"))
print("batched contract:", Z)

# labeled Kronecker (the DTensorKroneckerProductRef stub, completed)
K = A.kron(dtensor(jnp.asarray(rng.standard_normal(2)), ("m",)))
print("kron:", K)

# labeled diagonal / trace
T = dtensor(jnp.asarray(rng.standard_normal((4, 4, 3))), ("p", "q", "r"))
print("trace p=q:", T.trace_label("p", "q"))
print("diag kept:", T.trace_label("p", "q", out_label="d"))

# element-wise ops auto-align by label, whatever the axis order
P = A.transpose_to(("j", "i"))
S = A + P  # aligns P back to ("i", "j")
assert np.allclose(np.asarray(S.to_array()), 2 * np.asarray(A.data))

print("sample_dtensor OK")
