from .mesh import data_sharding, make_mesh, replicated  # noqa: F401
