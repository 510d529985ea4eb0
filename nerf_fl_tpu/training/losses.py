"""Training losses, as pure functions returning named-term dicts.

Semantics follow reference losses.py:4-53, including the NeRF-W quirks:
the ``+3`` empirical offset on the beta log-likelihood term (losses.py:44)
and lambda_u = 0.01 on the transient-sigma regularizer.  The caller sums the
dict values (reference train.py:161-162).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def color_loss(results: Dict, targets: jnp.ndarray, coef: float = 1.0) -> Dict:
    """Plain coarse(+fine) MSE (reference losses.py:4-15)."""
    loss = jnp.mean((results["rgb_coarse"] - targets) ** 2)
    if "rgb_fine" in results:
        loss = loss + jnp.mean((results["rgb_fine"] - targets) ** 2)
    return {"color": coef * loss}


def nerfw_loss(results: Dict, targets: jnp.ndarray, coef: float = 1.0,
               lambda_u: float = 0.01) -> Dict:
    """NeRF-W eq. 13 (reference losses.py:18-50).

    Terms: c_l coarse color, f_l fine color (beta-weighted NLL when the
    transient head is active), b_l = 3 + mean(log beta), s_l = lambda_u *
    mean(transient sigma).
    """
    ret = {"c_l": 0.5 * jnp.mean((results["rgb_coarse"] - targets) ** 2)}
    if "rgb_fine" in results:
        if "beta" not in results:
            ret["f_l"] = 0.5 * jnp.mean((results["rgb_fine"] - targets) ** 2)
        else:
            beta = results["beta"][:, None]
            ret["f_l"] = jnp.mean(
                (results["rgb_fine"] - targets) ** 2 / (2.0 * beta**2))
            ret["b_l"] = 3.0 + jnp.mean(jnp.log(results["beta"]))
            ret["s_l"] = lambda_u * jnp.mean(results["transient_sigmas"])
    return {k: coef * v for k, v in ret.items()}


loss_dict = {"color": color_loss, "nerfw": nerfw_loss}
