from . import compositing, encoding, lie, rays, sampling  # noqa: F401
