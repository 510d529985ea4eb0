"""Offline ray-cache builder for phototourism scenes.

Writes the same cache artifacts (names and contents) as the reference
prepare_phototourism.py:18-50, so caches interoperate in both directions:
img_ids.pkl, img_to_cam_id.pkl, image_paths.pkl, Ks{d}.pkl, xyz_world.npy,
poses.npy, nears.pkl, fars.pkl, rays{d}.npy (6-col [dir, near, far, id]),
rgbs{d}.npy.
"""
import argparse
import os
import pickle

import numpy as np

from nerf_fl_tpu.data.phototourism import PhototourismDataset


def get_opts():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root_dir', type=str, required=True,
                        help='root directory of dataset')
    parser.add_argument('--img_downscale', type=int, default=1,
                        help='how much to downscale the images for phototourism dataset')
    return parser.parse_args()


def main(args):
    os.makedirs(os.path.join(args.root_dir, 'cache'), exist_ok=True)
    print(f'Preparing cache for scale {args.img_downscale}...')
    dataset = PhototourismDataset(args.root_dir, 'train', args.img_downscale)

    def dump(name, obj):
        with open(os.path.join(args.root_dir, f'cache/{name}'), 'wb') as f:
            pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)

    dump('img_ids.pkl', dataset.img_ids)
    dump('img_to_cam_id.pkl', dataset.image_to_cam)
    dump('image_paths.pkl', dataset.image_paths)
    dump(f'Ks{args.img_downscale}.pkl', dataset.Ks)
    np.save(os.path.join(args.root_dir, 'cache/xyz_world.npy'),
            dataset.xyz_world)
    np.save(os.path.join(args.root_dir, 'cache/poses.npy'), dataset.poses)
    dump('nears.pkl', dataset.nears)
    dump('fars.pkl', dataset.fars)
    np.save(os.path.join(args.root_dir,
                         f'cache/rays{args.img_downscale}.npy'),
            dataset.reference_format_rays())
    np.save(os.path.join(args.root_dir,
                         f'cache/rgbs{args.img_downscale}.npy'),
            dataset.all_rgbs)
    print(f"Data cache saved to {os.path.join(args.root_dir, 'cache')} !")


if __name__ == '__main__':
    main(get_opts())
