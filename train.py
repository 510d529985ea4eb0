"""Training entry point (reference train.py:213-246 semantics).

Usage mirrors the reference, e.g.:
  python train.py --dataset_name blender --root_dir <lego> \
      --N_importance 64 --img_wh 400 400 --noise_std 0 --num_epochs 20 \
      --batch_size 1024 --optimizer adam --lr 5e-4 --lr_scheduler cosine \
      --exp_name exp
"""
from opt import get_opts
from nerf_fl_tpu.training.system import NeRFSystem


def main(hparams):
    from nerf_fl_tpu.utils.compile_cache import enable_compile_cache
    from nerf_fl_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    enable_compile_cache()
    if getattr(hparams, "num_hosts", 1) > 1:
        # must run before any JAX backend use (parallel/multihost.py)
        from nerf_fl_tpu.parallel import multihost
        multihost.initialize_distributed(
            hparams.coordinator_address, hparams.num_hosts,
            hparams.host_index)
    system = NeRFSystem(hparams)
    system.setup()
    system.configure()
    system.fit()


if __name__ == "__main__":
    main(get_opts())
