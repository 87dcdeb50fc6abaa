from .config import DEMConfig, Wall, DEFAULT_WALLS
from .coupling import write_final_positions
from .forces import (make_cell_lanes, make_cell_list,
                     make_cell_matrix, make_dem_rhs)
from .icond import icond_dense, icond_sparse, icond_2spheres
