"""Strip a training checkpoint down to bare weights (reference
utils/save_weights_only.py): drops optimizer state and bookkeeping, keeping
only state_dict — the file eval.py needs."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flax import serialization  # noqa: E402

from nerf_fl_tpu.training.checkpoints import load_checkpoint  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt_path', required=True)
    p.add_argument('--out', default=None,
                   help='default: <ckpt_path> with _weights suffix')
    args = p.parse_args()

    ckpt = load_checkpoint(args.ckpt_path)
    slim = {'state_dict': ckpt['state_dict'],
            'epoch': ckpt.get('epoch', 0),
            'global_step': ckpt.get('global_step', 0)}
    base, ext = os.path.splitext(args.ckpt_path)
    out = args.out or f'{base}_weights{ext}'
    with open(out, 'wb') as f:
        f.write(serialization.msgpack_serialize(slim))
    old = os.path.getsize(args.ckpt_path)
    new = os.path.getsize(out)
    print(f'wrote {out} ({new/1e6:.1f} MB, was {old/1e6:.1f} MB)')


if __name__ == '__main__':
    main()
