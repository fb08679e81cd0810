from . import megakernel
