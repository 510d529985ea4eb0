"""NeRF-U PSNR regression (reference test_nerfu_occ.ipynb): occlusion-
perturbed lego, transient head.  All flags of psnr_regression.py may be
added."""
import sys

import psnr_regression


def main(argv=None):
    preset = ['--data_perturb', 'occ', '--encode_t']
    return psnr_regression.main(preset + (argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
