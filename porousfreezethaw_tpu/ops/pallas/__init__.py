from .stencil import make_fused_stage, fused_stage_available
