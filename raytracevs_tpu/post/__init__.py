from . import composite, debug_modes, denoise, tonemap
