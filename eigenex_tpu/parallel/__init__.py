from .distributed import (
    DistributedKrylovSchurArnoldiSolver,
    DistributedLanczosEigenSolver,
    DistributedLOBPCGSolver,
    DistributedShiftInvertLanczosEigenSolver,
    DistributedThickRestartLanczosEigenSolver,
    distributed_arnoldi_steps,
    distributed_lanczos_steps,
    halo_matmat,
    halo_matvec,
    mesh_operator,
    pad_bsr_for_mesh,
    split_bsr_halo,
    split_sym_bsr_halo,
    sym_halo_matmat,
    sym_halo_matvec,
)
from .mesh import ROWS, initialize_multihost, make_mesh, replicated_sharding, row_sharding
