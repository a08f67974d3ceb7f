from . import se3, sim3, camera, triangulate, robust  # noqa: F401
