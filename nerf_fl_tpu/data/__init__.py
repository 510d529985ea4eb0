"""Dataset registry (reference datasets/__init__.py:1-7)."""
from .blender import BlenderDataset  # noqa: F401
from .sampler import RayBatcher  # noqa: F401


def _lazy_phototourism(*args, **kwargs):
    from .phototourism import PhototourismDataset
    return PhototourismDataset(*args, **kwargs)


def _lazy_llff(*args, **kwargs):
    from .llff import LLFFDataset
    return LLFFDataset(*args, **kwargs)


dataset_dict = {
    "blender": BlenderDataset,
    "phototourism": _lazy_phototourism,
    "llff": _lazy_llff,
}
