from . import intersect, render, sampling, shade, wavefront
