from .mlp import NeRFConfig, apply_nerf, init_nerf, num_params  # noqa: F401
from .embeddings import embedding_lookup, init_embedding, validate_vocab  # noqa: F401
from .poses import all_poses, init_learn_pose, pose_for  # noqa: F401
