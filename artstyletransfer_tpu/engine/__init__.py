from .pyramid import build_input_pyramids, resize_to_level  # noqa: F401
