from . import bvh, intersect, photon, render, sampling, shade, wavefront
