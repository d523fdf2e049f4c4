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
from ..ops.transforms import safe_tanh


ACTS = {
    "relu": jax.nn.relu,
    # safe_tanh, not jnp.tanh: the TPU f64-emulation lowering returns NaN
    # for large finite args (see ops/transforms.py) and hypernet hidden
    # pre-activations are unbounded
    "tanh": safe_tanh,
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

    def __post_init__(self):
        if self.batch_norm and self.inference != "MC_dropout":
            # the reference's BN lives in the pytorchlib.apply_linear MLP
            # blocks used by the MC-dropout hypernets (flow.py:944-957);
            # its BNN_VILR VI nets have no BN (BNN_VILR.py:47-92)
            raise NotImplementedError(
                "batch_norm is only supported for MC_dropout hypernets")

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        """(din, dout) per linear layer, ending in the scalar output.

        VI nets are ONE hidden layer deeper than MC-dropout nets at the
        same num_hidden: the reference builds its dropout MLPs with num_H
        hidden blocks (flow.py:665-689) but its VI nets as
        BNN_VILR(H, num_H+1, ...) = an in->H layer plus num_H H->H layers
        plus the linear output (flow.py:875-877, BNN_VILR.py:60-67)."""
        n_hidden = self.num_hidden
        if self.inference == "mean_field_gaussian":
            n_hidden += 1
        dims = []
        d = self.in_dim
        for _ in range(n_hidden):
            dims.append((d, self.hidden_dim))
            d = self.hidden_dim
        dims.append((d, 1))
        return tuple(dims)


def init_hypernet(spec: HyperNetSpec, key, dtype=None):
    dtype = dtype or cfg.default_dtype()
    layers = []
    n = len(spec.layer_dims())
    for i, (din, dout) in enumerate(spec.layer_dims()):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        if spec.inference == "MC_dropout":
            # Kaiming-uniform-ish init (torch Linear default):
            bound = 1.0 / np.sqrt(din)
            W = jax.random.uniform(k1, (din, dout), dtype, -bound, bound)
            b = jax.random.uniform(k2, (dout,), dtype, -bound, bound)
            layer = {"W": W, "b": b}
            if spec.batch_norm and i < n - 1:
                # torch BatchNorm1d defaults: gamma=1, beta=0; the running
                # mean/var leaves are excluded from optimisation (Trainer
                # freezes them) and set by finalize_bn_stats after training
                layer["bn"] = {"gamma": jnp.ones(dout, dtype),
                               "beta": jnp.zeros(dout, dtype),
                               "mean": jnp.zeros(dout, dtype),
                               "var": jnp.ones(dout, dtype)}
            layers.append(layer)
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


LOGVAR_CAP = 30.0


def _exp_lin(lv, cap=LOGVAR_CAP):
    """exp with a linear tail past `cap`: finite in fp32 (exp(88) infs)
    while keeping a positive d/dlv so the KLD can still push a runaway
    logvar back down (a plain clip zeroes that gradient).  Used by BOTH
    the sampled forward's variance and the KLD term so the objective and
    its gradient agree in the runaway band."""
    return jnp.where(lv > cap,
                     jnp.exp(cap) * (1.0 + (lv - cap)),
                     jnp.exp(jnp.minimum(lv, cap)))


def _batch_norm(layer_bn, h, use_batch_stats: bool, eps: float = 1e-5):
    """BatchNorm over all leading axes of h (..., dout).

    use_batch_stats=True normalises with the current batch's statistics
    (torch train-mode behaviour: running stats never affect training
    dynamics); False uses the stored stats (torch eval mode — note the
    reference's `enable_eval_dropout` re-enables Dropout modules only,
    BN stays in eval mode, utils_models.py:358-364)."""
    if use_batch_stats:
        axes = tuple(range(h.ndim - 1))
        mean = jnp.mean(h, axis=axes)
        var = jnp.var(h, axis=axes)
    else:
        mean, var = layer_bn["mean"], layer_bn["var"]
    return layer_bn["gamma"] * (h - mean) / jnp.sqrt(var + eps) + layer_bn["beta"]


def apply_hypernet(spec: HyperNetSpec, params, X, *, rng=None,
                   stochastic: bool = True, mean_only: bool = False,
                   train: bool = False):
    """Forward X (..., in_dim) -> (...,) scalar flow parameter per row.

    stochastic=True keeps dropout / weight sampling active (training or
    MC-dropout evaluation).  mean_only=True uses the deterministic mean path
    (used by the hypernet initializer, reference BNN_VILR.py:37-38).
    train=True additionally puts batch-norm layers in batch-statistics mode
    (ELBO training only; all evaluation paths use the stored stats).
    """
    act = ACTS[spec.activation]
    n_layers = len(params["layers"])
    h = X
    for i, layer in enumerate(params["layers"]):
        last = i == n_layers - 1
        if spec.inference == "MC_dropout":
            h = h @ layer["W"] + layer["b"]
            if not last:
                if spec.batch_norm:
                    # Linear -> BN -> activation -> dropout (the reference's
                    # pytorchlib.apply_linear block order, flow.py:666-689)
                    h = _batch_norm(layer["bn"], h, use_batch_stats=train)
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
                # linear-tail exp past LOGVAR_CAP: a transient logvar spike
                # past ~88 would inf fp32 where the reference's fp64
                # survives to 709.  Same form as the KLD term so objective
                # and gradient stay consistent in the runaway band.
                var = ((h ** 2) @ _exp_lin(layer["w_logvar"])
                       + _exp_lin(layer["b_logvar"]))
                if rng is None:
                    raise ValueError("VI hypernet sampling requires an rng")
                rng, sub = jax.random.split(rng)
                eps = jax.random.normal(sub, var.shape, h.dtype)
                s = mu + eps * jnp.sqrt(var)
            h = s if last else act(s)
    return jnp.squeeze(h, axis=-1)


def finalize_bn_stats(spec: HyperNetSpec, params, X):
    """Set each BN layer's stored mean/var from a deterministic full pass
    over X (dropout off, earlier BN layers already using their fresh stats).

    The jit-friendly functional replacement for torch's running-average
    update: a single recalibration pass over the training inputs after
    optimisation (the stats only matter at evaluation)."""
    if spec.inference != "MC_dropout" or not spec.batch_norm:
        return params
    act = ACTS[spec.activation]
    n_layers = len(params["layers"])
    new_layers = []
    h = X
    for i, layer in enumerate(params["layers"]):
        last = i == n_layers - 1
        h = h @ layer["W"] + layer["b"]
        if not last and "bn" in layer:
            axes = tuple(range(h.ndim - 1))
            bn = dict(layer["bn"], mean=jnp.mean(h, axis=axes),
                      var=jnp.var(h, axis=axes))
            layer = dict(layer, bn=bn)
            h = _batch_norm(bn, h, use_batch_stats=False)
        new_layers.append(layer)
        if not last:
            h = act(h)
    return dict(params, layers=new_layers)


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
                -1.0 + p_logvar - q_lv + _exp_lin(q_lv) / spec.prior_var
                + jnp.square(q_m) / spec.prior_var
            )
    return total
