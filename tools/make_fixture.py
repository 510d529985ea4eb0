"""Generate a synthetic Blender-format scene (no dataset download needed).

An analytic ball — optionally with a checker texture — rendered to the
exact transforms_{split}.json + PNG layout the Blender loader consumes
(reference datasets/blender.py:50-102), so every train/eval/perturbation
feature can be exercised without nerf_synthetic.  The same generator
backs the test suite and the quality-matrix experiments (docs/QUALITY.md).

Usage:
  python tools/make_fixture.py /tmp/demo_scene --train 40 --size 800 --texture
"""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    p = ArgumentParser(description=__doc__)
    p.add_argument("root", help="output scene directory")
    p.add_argument("--train", type=int, default=40,
                   help="number of training views")
    p.add_argument("--val", type=int, default=4)
    p.add_argument("--test", type=int, default=8)
    p.add_argument("--size", type=int, default=800,
                   help="native image size (the seeded occlusion "
                        "perturbation is sized for 800)")
    p.add_argument("--texture", action="store_true",
                   help="checker surface texture (anchors the NeRF-W "
                        "static/appearance decomposition, docs/QUALITY.md)")
    args = p.parse_args()

    from nerf_fl_tpu.data.synthetic import make_blender_scene
    make_blender_scene(args.root, n_train=args.train, n_val=args.val,
                       n_test=args.test, size=args.size,
                       texture=args.texture)
    print(f"wrote {args.train}+{args.val}+{args.test} views at "
          f"{args.size}x{args.size} to {args.root}")


if __name__ == "__main__":
    main()
