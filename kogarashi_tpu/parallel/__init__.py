from .msm import distributed_msm, distributed_msm_pallas, make_mesh
from .ntt import DistributedDomain
from .prover import distributed_h_coeffs

__all__ = [
    "distributed_msm",
    "distributed_msm_pallas",
    "make_mesh",
    "DistributedDomain",
    "distributed_h_coeffs",
]
