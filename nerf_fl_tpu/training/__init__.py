from . import checkpoints, losses, metrics, optimizers  # noqa: F401
from .system import (  # noqa: F401
    NeRFSystem, build_params, config_from_hparams, make_train_step,
    render_chunked,
)
