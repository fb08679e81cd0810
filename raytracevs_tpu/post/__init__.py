from . import composite, tonemap
