"""Multi-chip scaling via jax.sharding — the TPU-native replacement for a
communication backend.

The reference is single-process single-GPU (SURVEY.md §2.3: no
torch.distributed / NCCL anywhere); its scaling axes are minibatch SVI and
the batched multi-output structure.  On TPU those become mesh axes:

  * 'dp' — data parallel: the minibatch axis is sharded across chips; the
    ELL sum and gradient all-reduce ride the ICI as XLA-inserted psums.
  * 'ty' — output parallel (the multioutput Dy axis): each chip owns a
    subset of the independent output GPs — the model's "batched multi-GP
    parallelism" (reference: batched kernels with batch_shape=[Dy],
    code/dsp/models/utils_models.py:184-204) mapped onto hardware.  No
    cross-output communication exists in the math, so this axis scales
    embarrassingly until the final scalar ELBO reduction.

Parameters without a Dy-leading axis are replicated; XLA partitions the
per-output (M,M) Cholesky factorizations and Gram matmuls independently per
'ty' shard.  Quadrature (S) and MC-dropout (S_MC) axes stay chip-local —
they are embarrassingly parallel within the batch shard (SURVEY.md §2.3
documents why no sequence/ring machinery is needed).
"""

from __future__ import annotations

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.tgp import TGPSpec


def make_mesh(dp: int = 1, ty: int = 1, devices=None) -> Mesh:
    """Build a (dp, ty) device mesh.  dp*ty must equal len(devices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp * ty != n:
        raise ValueError(f"dp*ty = {dp * ty} != device count {n}")
    arr = np.array(devices).reshape(dp, ty)
    return Mesh(arr, axis_names=("dp", "ty"))


def batch_sharding(mesh: Mesh):
    """Minibatch tensors: leading batch axis over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def param_sharding(spec: TGPSpec, params, mesh: Mesh):
    """Sharding pytree for model parameters.

    Leaves with a leading Dy axis divisible by the 'ty' mesh size are
    sharded over 'ty' (inducing sets, q(U), kernel hyper-parameters, stacked
    flow parameters); everything else is replicated.
    """
    ty = mesh.shape["ty"]
    Dy = spec.Dy

    def rule(x):
        if ty > 1 and x.ndim >= 1 and x.shape[0] == Dy and Dy % ty == 0:
            return NamedSharding(mesh, P("ty", *([None] * (x.ndim - 1))))
        return replicate(mesh)

    return jax.tree_util.tree_map(rule, params)


def shard_batch(mesh: Mesh, *arrays):
    """device_put batch arrays with the dp sharding (pads are caller's job —
    batch size must divide the dp axis)."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_sharded_train_step(spec: TGPSpec, optimizer, mesh: Mesh,
                            params_shardings=None):
    """jit-compiled sharded train step.

    The minibatch enters dp-sharded; parameters are replicated (or
    ty-sharded); jit + NamedSharding make XLA insert the gradient psum over
    'dp' and keep per-output work local to its 'ty' shard.
    """
    from ..models import tgp as tgp_mod

    def step(params, opt_state, X, Y, rng):
        def loss_fn(p):
            e, ell, kld = tgp_mod.elbo(spec, p, X, Y, rng)
            return -e, (ell, kld)

        (neg_e, (ell, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (-neg_e, ell, kld)

    in_shardings = (
        params_shardings,            # params (None -> let XLA decide/replicate)
        None,                        # opt state
        batch_sharding(mesh),        # X
        batch_sharding(mesh),        # Y
        replicate(mesh),             # rng
    )
    return jax.jit(step, in_shardings=in_shardings, donate_argnums=(0, 1))
