"""Full NeRF-W PSNR regression (reference test_nerfw_all.ipynb): color+occ
perturbed lego, appearance + transient.  All flags of psnr_regression.py may
be added."""
import sys

import psnr_regression


def main(argv=None):
    preset = ['--data_perturb', 'color', 'occ', '--encode_a', '--encode_t']
    return psnr_regression.main(preset + (argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
