from .config import DEMConfig, Wall, DEFAULT_WALLS
from .forces import make_dem_rhs
from .icond import icond_dense, icond_sparse, icond_2spheres
