"""Golden-value oracle: runs the UNTRUSTED reference implementation (read-only
at /root/reference, CPU torch) on identical inputs/weights to check numerical
parity of our JAX pipeline.  Only used by tests; the framework itself never
imports torch or reference code."""
from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"

_ok = None


def reference_available() -> bool:
    global _ok
    if _ok is None:
        try:
            _load()
            _ok = True
        except Exception:
            _ok = False
    return _ok


def _load():
    # APPEND so reference modules never shadow same-named repo modules
    # (both trees have an eval.py; the repo one must win for `import eval`)
    if REF not in sys.path:
        sys.path.append(REF)
    # stub deps the reference's utils package pulls in but we don't need
    for name in ("torch_optimizer",):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    import losses as ref_losses  # noqa: F401
    import models.nerf as ref_nerf  # noqa: F401
    import models.rendering as ref_rendering  # noqa: F401
    return ref_nerf, ref_rendering, ref_losses


def get_reference():
    return _load()


def to_torch_nerf(params, mcfg):
    """Copy our parameter pytree into a reference NeRF module.

    Our weights are (in, out); torch Linear stores (out, in)."""
    import torch
    ref_nerf, _, _ = _load()
    m = ref_nerf.NeRF(
        mcfg.typ, D=mcfg.D, W=mcfg.W, skips=list(mcfg.skips),
        in_channels_xyz=mcfg.in_channels_xyz,
        in_channels_dir=mcfg.in_channels_dir,
        encode_appearance=mcfg.encode_appearance,
        in_channels_a=mcfg.in_channels_a,
        encode_transient=mcfg.encode_transient,
        in_channels_t=mcfg.in_channels_t,
        beta_min=mcfg.beta_min)
    sd = m.state_dict()

    def put(name, layer):
        sd[name + ".weight"] = torch.tensor(np.asarray(layer["w"]).T.copy())
        sd[name + ".bias"] = torch.tensor(np.asarray(layer["b"]).copy())

    for i, layer in enumerate(params["xyz"]):
        put(f"xyz_encoding_{i+1}.0", layer)
    put("xyz_encoding_final", params["xyz_final"])
    put("dir_encoding.0", params["dir"])
    put("static_sigma.0", params["static_sigma"])
    put("static_rgb.0", params["static_rgb"])
    if mcfg.encode_transient:
        tp = params["transient"]
        for j, layer in enumerate(tp["layers"]):
            put(f"transient_encoding.{2*j}", layer)
        put("transient_sigma.0", tp["sigma"])
        put("transient_rgb.0", tp["rgb"])
        put("transient_beta.0", tp["beta"])
    m.load_state_dict(sd)
    m.eval()
    return m


def to_torch_embedding(table):
    import torch
    t = torch.nn.Embedding(*np.asarray(table).shape)
    t.weight.data = torch.tensor(np.asarray(table).copy())
    return t


def torch_pos_embedding(n_freqs):
    ref_nerf, _, _ = _load()
    return ref_nerf.PosEmbedding(n_freqs - 1, n_freqs)


def run_reference_render(params, cfg, rays, ts, *, test_time=False,
                         output_transient=True):
    """Reference render_rays on our params, deterministic settings
    (perturb=0, noise_std=0)."""
    import torch
    _, ref_rendering, _ = _load()
    models = {"coarse": to_torch_nerf(params["nerf_coarse"],
                                      cfg.nerf_config("coarse"))}
    if "nerf_fine" in params:
        models["fine"] = to_torch_nerf(params["nerf_fine"],
                                       cfg.nerf_config("fine"))
    embeddings = {
        "xyz": torch_pos_embedding(cfg.N_emb_xyz),
        "dir": torch_pos_embedding(cfg.N_emb_dir),
    }
    if "embedding_a" in params:
        embeddings["a"] = to_torch_embedding(params["embedding_a"])
    if "embedding_t" in params:
        embeddings["t"] = to_torch_embedding(params["embedding_t"])

    with torch.no_grad():
        res = ref_rendering.render_rays(
            models, embeddings,
            torch.tensor(np.asarray(rays)), torch.tensor(np.asarray(ts)),
            N_samples=cfg.N_samples, use_disp=cfg.use_disp, perturb=0,
            noise_std=0, N_importance=cfg.N_importance, chunk=1 << 20,
            white_back=cfg.white_back, test_time=test_time,
            output_transient=output_transient)
    return {k: v.numpy() for k, v in res.items()}
