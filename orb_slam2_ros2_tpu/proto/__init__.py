from .orbslam2_map_pb2 import MapData  # noqa: F401
