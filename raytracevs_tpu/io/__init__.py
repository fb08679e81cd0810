from . import fbx, mesh_cache, native, png, settings
