"""NeRF-A PSNR regression (reference test_nerfa_color.ipynb): color-perturbed
lego, appearance embeddings.  All flags of psnr_regression.py may be added."""
import sys

import psnr_regression


def main(argv=None):
    preset = ['--data_perturb', 'color', '--encode_a']
    return psnr_regression.main(preset + (argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
