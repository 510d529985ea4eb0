"""Generate a phototourism-style scene tsv from a COLMAP reconstruction
(reference utils/gen_nerf_tsv.py semantics, minus its hardcoded paths).

Emits filename / id / split / dataset rows; ids are read from images.bin
(the authoritative source), split defaults to all-train with an optional
held-out tail.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_fl_tpu.data.colmap import read_images_binary  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--root_dir', required=True,
                   help='scene root containing dense/sparse/images.bin')
    p.add_argument('--dataset_name', default='phototourism')
    p.add_argument('--out', default=None,
                   help='output tsv path (default <root>/<scene>.tsv)')
    p.add_argument('--n_test', type=int, default=0,
                   help='hold out the last N images as the test split')
    args = p.parse_args()

    imdata = read_images_binary(
        os.path.join(args.root_dir, 'dense/sparse/images.bin'))
    rows = sorted((v.name, v.id) for v in imdata.values())
    scene = os.path.basename(args.root_dir.rstrip('/'))
    out = args.out or os.path.join(args.root_dir, f'{scene}.tsv')
    with open(out, 'w') as f:
        f.write('filename\tid\tsplit\tdataset\n')
        for i, (name, id_) in enumerate(rows):
            split = 'test' if i >= len(rows) - args.n_test and args.n_test \
                else 'train'
            f.write(f'{name}\t{id_}\t{split}\t{args.dataset_name}\n')
    print(f'wrote {len(rows)} rows to {out}')


if __name__ == '__main__':
    main()
