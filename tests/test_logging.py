"""ExperimentLogger: TB event files + JSONL mirror."""
import json
import os

import numpy as np

from nerf_fl_tpu.training.logging import ExperimentLogger, NullLogger


def test_scalars_and_images(tmp_path):
    lg = ExperimentLogger(str(tmp_path), "exp1")
    lg.scalars({"train/loss": 1.5, "lr": 5e-4}, step=0)
    lg.scalars({"train/loss": 1.0}, step=10)
    lg.images("val/GT_pred_depth",
              np.random.rand(3, 3, 8, 8).astype(np.float32), step=10)
    lg.close()

    jsonl = os.path.join(tmp_path, "exp1", "metrics.jsonl")
    recs = [json.loads(l) for l in open(jsonl)]
    assert recs[0]["train/loss"] == 1.5 and recs[0]["step"] == 0
    assert recs[1]["train/loss"] == 1.0 and recs[1]["step"] == 10
    # TB event file written when tensorboard is available
    files = os.listdir(os.path.join(tmp_path, "exp1"))
    assert any(f.startswith("events") for f in files) or len(files) == 1


def test_null_logger_noops():
    lg = NullLogger()
    lg.scalars({"x": 1.0}, 0)
    lg.images("t", np.zeros((1, 3, 4, 4)), 0)
    lg.close()
