"""Phototourism PSNR regression + appearance interpolation (reference
test_phototourism.ipynb): renders train/val views of a COLMAP scene with
per-image PSNR; the notebook's interpolation cells 10-12 live in
appearance_interpolation.py."""
import sys

import psnr_regression


def main(argv=None):
    preset = ['--dataset_name', 'phototourism', '--encode_a', '--encode_t']
    return psnr_regression.main(preset + (argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
