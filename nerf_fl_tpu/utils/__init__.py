from .visualization import visualize_depth  # noqa: F401
