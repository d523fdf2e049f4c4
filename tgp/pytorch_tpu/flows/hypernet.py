"""Hypernetworks producing input-dependent flow parameters.

Two inference modes, mirroring the reference (code/dsp/models/flow.py:643-714,
836-887):
  * 'MC_dropout'          — plain MLP with dropout on hidden layers; dropout
                            stays active at evaluation time when the model is
                            run "fully Bayesian" (MC-dropout posterior,
                            reference: code/dsp/models/utils_models.py:358-364).
                            In JAX this is an explicit rng + flag, no module
                            state.
  * 'mean_field_gaussian' — mean-field Gaussian VI BNN with the local
                            reparameterization trick
                            (reference: code/dsp/models/BNN_VILR.py:10-92);
                            exposes a closed-form KL added to the ELBO.

Hidden layers: Linear -> activation -> dropout.  Final layer is linear to a
single scalar output per input row.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg


ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
}


@dataclasses.dataclass(frozen=True)
class HyperNetSpec:
    """Static hypernet architecture.

    Defaults match the reference (code/dsp/models/flow.py:645):
    one hidden layer of width input_dim, relu, MC dropout.
    """

    in_dim: int
    hidden_dim: int
    num_hidden: int = 1
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    inference: str = "MC_dropout"  # or 'mean_field_gaussian'
    prior_var: float = 1.0         # VI prior variance (flow.py:874)

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        dims = []
        d = self.in_dim
        for _ in range(self.num_hidden):
            dims.append((d, self.hidden_dim))
            d = self.hidden_dim
        dims.append((d, 1))
        return tuple(dims)


def init_hypernet(spec: HyperNetSpec, key, dtype=None):
    dtype = dtype or cfg.default_dtype()
    layers = []
    for (din, dout) in spec.layer_dims():
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        if spec.inference == "MC_dropout":
            # Kaiming-uniform-ish init (torch Linear default):
            bound = 1.0 / np.sqrt(din)
            W = jax.random.uniform(k1, (din, dout), dtype, -bound, bound)
            b = jax.random.uniform(k2, (dout,), dtype, -bound, bound)
            layers.append({"W": W, "b": b})
        elif spec.inference == "mean_field_gaussian":
            # reference BNN_VILR: means ~ N(0,1), logvars ~ tiny negative
            # (code/dsp/models/BNN_VILR.py:20-23)
            layers.append({
                "w_mean": jax.random.normal(k1, (din, dout), dtype),
                "w_logvar": jax.random.normal(k2, (din, dout), dtype) * -1e-20,
                "b_mean": jax.random.normal(k3, (dout,), dtype),
                "b_logvar": jax.random.normal(k4, (dout,), dtype) * -1e-20,
            })
        else:
            raise NotImplementedError(spec.inference)
    return {"layers": layers}


def apply_hypernet(spec: HyperNetSpec, params, X, *, rng=None,
                   stochastic: bool = True, mean_only: bool = False):
    """Forward X (..., in_dim) -> (...,) scalar flow parameter per row.

    stochastic=True keeps dropout / weight sampling active (training or
    MC-dropout evaluation).  mean_only=True uses the deterministic mean path
    (used by the hypernet initializer, reference BNN_VILR.py:37-38).
    """
    act = ACTS[spec.activation]
    n_layers = len(params["layers"])
    h = X
    for i, layer in enumerate(params["layers"]):
        last = i == n_layers - 1
        if spec.inference == "MC_dropout":
            h = h @ layer["W"] + layer["b"]
            if not last:
                h = act(h)
                if spec.dropout > 0.0 and stochastic and not mean_only:
                    if rng is None:
                        raise ValueError("dropout requires an rng")
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1.0 - spec.dropout, h.shape)
                    h = jnp.where(keep, h / (1.0 - spec.dropout), 0.0)
        else:  # mean_field_gaussian with local reparameterization
            mu = h @ layer["w_mean"] + layer["b_mean"]
            if mean_only or not stochastic:
                s = mu
            else:
                var = (h ** 2) @ jnp.exp(layer["w_logvar"]) + jnp.exp(layer["b_logvar"])
                if rng is None:
                    raise ValueError("VI hypernet sampling requires an rng")
                rng, sub = jax.random.split(rng)
                eps = jax.random.normal(sub, var.shape, h.dtype)
                s = mu + eps * jnp.sqrt(var)
            h = s if last else act(s)
    return jnp.squeeze(h, axis=-1)


def hypernet_kld(spec: HyperNetSpec, params):
    """KL(q(w) || N(0, prior_var)) summed over all layers.

    reference: code/dsp/models/BNN_VILR.py:77-92.  Returns 0 for MC-dropout
    (its regulariser is weight decay, wired in the optimizer instead,
    reference: code/main.py:274-288).
    """
    if spec.inference != "mean_field_gaussian":
        return jnp.zeros(())
    p_logvar = jnp.log(jnp.asarray(spec.prior_var))
    total = 0.0
    for layer in params["layers"]:
        for m_key, lv_key in (("w_mean", "w_logvar"), ("b_mean", "b_logvar")):
            q_m, q_lv = layer[m_key], layer[lv_key]
            total = total + 0.5 * jnp.sum(
                -1.0 + p_logvar - q_lv + jnp.exp(q_lv) / spec.prior_var
                + jnp.square(q_m) / spec.prior_var
            )
    return total
