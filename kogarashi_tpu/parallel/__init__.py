from .msm import distributed_msm, make_mesh
from .ntt import DistributedDomain

__all__ = ["distributed_msm", "make_mesh", "DistributedDomain"]
