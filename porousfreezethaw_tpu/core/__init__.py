from .precision import enable_x64, default_dtype, set_default_dtype
from .grid import GridGeometry
