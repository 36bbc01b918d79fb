"""Heisenberg spin-chain tests (BASELINE config 3) — oracles: exact
dense diagonalization and the Bethe-ansatz-known small-chain energies."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenex_tpu.block.hamiltonians import (
    heisenberg_block_hamiltonian,
    heisenberg_ground_state,
    heisenberg_sector_coo,
    sector_structure,
    sz_sector_basis,
)
from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions


def dense_heisenberg(L, J=1.0, Jz=None, pbc=False):
    """Full 2^L dense XXZ Hamiltonian (oracle)."""
    if Jz is None:
        Jz = J
    sz = np.array([[0.5, 0], [0, -0.5]])
    sp = np.array([[0, 1.0], [0, 0]])
    sm = sp.T
    I = np.eye(2)

    def kronsite(op, i):
        mats = [I] * L
        mats[i] = op
        out = mats[0]
        for m in mats[1:]:
            out = np.kron(out, m)
        return out

    H = np.zeros((2**L, 2**L))
    bonds = [(i, i + 1) for i in range(L - 1)] + ([(L - 1, 0)] if pbc and L > 2 else [])
    for i, j in bonds:
        H += J / 2 * (kronsite(sp, i) @ kronsite(sm, j) + kronsite(sm, i) @ kronsite(sp, j))
        H += Jz * kronsite(sz, i) @ kronsite(sz, j)
    return H


class TestSectorBasis:
    def test_basis_sizes(self):
        from math import comb

        for L in (4, 6):
            for k in range(L + 1):
                assert len(sz_sector_basis(L, k)) == comb(L, k)

    def test_sector_structure_covers_space(self):
        s = sector_structure(6)
        assert s.dim == 64


class TestSectorHamiltonian:
    @pytest.mark.parametrize("pbc", [False, True])
    def test_sector_eigs_match_dense(self, pbc):
        """Union of sector spectra == full dense spectrum."""
        L = 6
        Hd = dense_heisenberg(L, pbc=pbc)
        all_dense = np.sort(np.linalg.eigvalsh(Hd))
        sector_eigs = []
        for k in range(L + 1):
            coo = heisenberg_sector_coo(L, k, pbc=pbc)
            sector_eigs.append(np.linalg.eigvalsh(np.asarray(coo.to_dense())))
        np.testing.assert_allclose(np.sort(np.concatenate(sector_eigs)), all_dense, atol=1e-12)

    def test_sector_hermitian(self):
        coo = heisenberg_sector_coo(8, 4)
        d = np.asarray(coo.to_dense())
        np.testing.assert_allclose(d, d.T, atol=1e-14)


class TestGroundState:
    def test_ground_state_L10(self):
        """Lanczos ground state of the L=10 chain matches dense.

        (The known open-chain L=10 Heisenberg ground energy ≈ -4.2580352.)"""
        e, sector, vec, energies = heisenberg_ground_state(10)
        ref = np.linalg.eigvalsh(dense_heisenberg(10)).min()
        np.testing.assert_allclose(e, ref, atol=1e-9)
        assert sector == 5  # half filling

    def test_block_hamiltonian_matches_dense_blocks(self):
        L = 6
        bt = heisenberg_block_hamiltonian(L, storage="dense")
        # block-diagonal by Sz conservation
        assert all(k[0] == k[1] for k in bt.block_keys())
        # each sector block's spectrum matches its sparse twin
        for k in range(L + 1):
            coo = heisenberg_sector_coo(L, k)
            np.testing.assert_allclose(
                np.linalg.eigvalsh(np.asarray(bt.blocks[(k, k)])),
                np.linalg.eigvalsh(np.asarray(coo.to_dense())),
                atol=1e-12,
            )

    def test_block_matvec_ground_energy(self):
        """BlockTensor contract as Hamiltonian application: Rayleigh
        quotient at the per-sector Lanczos ground vector."""
        L = 8
        bt = heisenberg_block_hamiltonian(L, storage="dense")
        e, sector, vec, _ = heisenberg_ground_state(L)
        from eigenex_tpu.block.block_tensor import BlockTensor

        psi = BlockTensor([bt.structures[1]], dtype=np.float64)
        psi.set_block((sector,), jnp.asarray(np.asarray(vec)[:, 0]))
        hpsi = bt.contract(psi, [(1, 0)])
        num = float(sum(jnp.vdot(psi.blocks[k], hpsi.blocks[k]) for k in psi.blocks))
        np.testing.assert_allclose(num, e, atol=1e-8)
