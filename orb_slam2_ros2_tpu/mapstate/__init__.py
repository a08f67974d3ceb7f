from .map_state import MapState, empty_map  # noqa: F401
