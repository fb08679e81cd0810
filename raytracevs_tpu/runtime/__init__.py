from .engine import Engine, render_rtvs
