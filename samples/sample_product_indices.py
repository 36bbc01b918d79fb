"""Multi-index bijection + string-labeled diagonal demo.

Mirrors reference sample_product_indices.cpp:15-37."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

from eigenex_tpu import ProductIndices

pi = ProductIndices([2, 3, 2])
print("dims:", pi.dims, "size:", pi.size)
print("flat -> multi -> flat round trip:")
for flat in range(pi.size):
    multi = pi.indices(flat)
    print(f"  {flat:2d} -> {multi} -> {pi.absolute_index(multi)}")

print()
print('relabel ["i","j","i"] -> ["i","j"] (diagonal merge by stride addition):')
pj = ProductIndices([2, 3, 2]).from_(["i", "j", "i"]).to(["i", "j"])
print("  result:", pj)
a = np.arange(12).reshape(2, 3, 2)
for i in range(2):
    for j in range(3):
        assert pj.absolute_index((i, j)) == np.ravel_multi_index((i, j, i), (2, 3, 2))
print("  verified: pj[(i,j)] addresses a[i,j,i] for all i,j")
