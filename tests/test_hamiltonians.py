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


# ---------------------------------------------------------------------------
# Transverse-field Ising: Z2 parity sectors + free-fermion closed form
# ---------------------------------------------------------------------------
class TestTFI:
    def _dense(self, L, J, h, pbc=True):
        n = 2**L
        H = np.zeros((n, n))
        for s in range(n):
            H[s, s] = -h * (2 * bin(s).count("1") - L)
            for i in range(L if pbc else L - 1):
                j = (i + 1) % L
                H[s ^ ((1 << i) | (1 << j)), s] += -J
        return H

    def test_sectors_reassemble_dense(self):
        from eigenex_tpu.block.hamiltonians import (
            parity_sector_basis, tfi_parity_sector_coo,
        )

        L, J, h = 6, 0.8, 1.3
        H = self._dense(L, J, h)
        evs = []
        for par in (0, 1):
            coo = tfi_parity_sector_coo(L, J, h, parity=par)
            assert coo.shape == (2 ** (L - 1),) * 2
            basis = parity_sector_basis(L, par)
            np.testing.assert_allclose(
                np.asarray(coo.to_dense()), H[np.ix_(basis, basis)], atol=1e-12
            )
            evs.append(np.linalg.eigvalsh(np.asarray(coo.to_dense())))
        np.testing.assert_allclose(
            np.sort(np.concatenate(evs)), np.linalg.eigvalsh(H), atol=1e-10
        )

    def test_exact_formula_matches_dense(self):
        from eigenex_tpu.block.hamiltonians import tfi_ground_energy_exact

        for L, J, h in ((8, 1.0, 1.0), (10, 1.0, 0.5), (8, 0.7, 1.1)):
            E0 = np.linalg.eigvalsh(self._dense(L, J, h))[0]
            assert abs(tfi_ground_energy_exact(L, J, h) - E0) < 1e-10

    def test_lanczos_ground_state_vs_closed_form(self):
        # L=16: sector dim 32768 — Lanczos in the even sector hits the
        # free-fermion closed form to 1e-10 (the TFI config analog of
        # the Laplacian closed-form oracle)
        from eigenex_tpu.block.hamiltonians import (
            tfi_ground_energy_exact, tfi_parity_sector_coo,
        )
        from eigenex_tpu.solvers.lanczos import LanczosEigenSolver, LanczosOptions

        L = 16
        coo = tfi_parity_sector_coo(L, 1.0, 1.0, parity=0)
        res = LanczosEigenSolver(
            coo.as_linear_operator(),
            LanczosOptions(max_eigenvalues=1, tolerance=1e-14, max_subspace=120,
                           compute_eigenvectors=False),
        ).compute()
        err = abs(res.eigenvalues[0] - tfi_ground_energy_exact(L))
        assert err < 1e-10, f"TFI L=16 measured error {err:.2e}"
