from .mesh import ba_mesh, device_count  # noqa: F401
