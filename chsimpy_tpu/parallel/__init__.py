from .mesh import make_grid_mesh, make_ensemble_mesh  # noqa: F401
