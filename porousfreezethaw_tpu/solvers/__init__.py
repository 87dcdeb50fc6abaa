from .merson import MersonParams, MersonState, merson_solve, merson_init
from .rk4 import rk4_solve
from .dopri import dopri45_solve, DopriResult
