"""Multi-process (multi-host) training — the DCN tier above the single
controller mesh of parallel/mesh.py.

The reference is a single-process codebase (SURVEY.md §2.3: no
torch.distributed anywhere); this module is the TPU-native scale-out tier
it never had.  Topology mapping:

  * within a host/pod slice: devices connected by ICI — the 'ty' axis and
    the intra-host part of 'dp' live here (fast collectives).
  * across hosts: DCN — `jax.distributed` forms the cluster; the mesh is
    laid out process-major so the 'dp' (outer) axis crosses hosts and the
    'ty' (inner) axis stays on one host's ICI.  Gradient psums then ride
    ICI within a host and cross DCN only once per step.

Each process runs the SAME single-controller program (SPMD): the Trainer's
scan fast paths work unchanged — only array *placement* differs, which is
what this module provides:

  * `initialize(...)`        — join the cluster (gloo collectives on CPU
                                test clusters; libtpu handles real pods).
  * `global_mesh(dp, ty)`    — a mesh over ALL processes' devices,
                                process-major on 'dp'.
  * `global_batch(mesh, *a)` — build a globally dp-sharded array from the
                                full (host-replicated) dataset: each
                                process extracts its row block and only
                                that block is materialised on its devices.
  * `local_rows(n, mesh)`    — the [start, stop) row block this process
                                owns under `global_batch`.

Verified end-to-end by tests/test_multihost.py: a real 2-process CPU
cluster (4 virtual devices each) trains the full-batch scan path and
reproduces the single-process 8-device run.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, platform: str | None = None,
               local_device_count: int | None = None) -> None:
    """Join a multi-process cluster.  MUST run before any other jax call.

    On a real TPU pod all arguments are auto-detected by jax and this
    reduces to `jax.distributed.initialize()`.  For CPU test clusters pass
    everything and `platform='cpu'` + `local_device_count=K` (K virtual
    devices per process, gloo cross-process collectives).
    """
    if platform == "cpu" and local_device_count:
        import re
        # drop any inherited device-count flag (e.g. from a test runner's
        # environment) — with duplicates the later occurrence wins
        inherited = re.sub(r"--xla_force_host_platform_device_count=\d+",
                           "", os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            f"{inherited} "
            f"--xla_force_host_platform_device_count={local_device_count}")
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(dp: int | None = None, ty: int = 1):
    """A (dp, ty) mesh over every device in the cluster, process-major:
    'dp' crosses hosts (DCN), 'ty' stays within a host (ICI).

    jax.devices() orders devices by process index, so a row-major
    (dp, ty) reshape keeps each host's devices contiguous along 'dp'
    exactly when ty divides the per-host device count — asserted."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs)
    if dp is None:
        dp = n // ty
    if dp * ty != n:
        raise ValueError(f"dp*ty = {dp * ty} != global device count {n}")
    per_host = len(jax.local_devices())
    if ty > 1 and per_host % ty != 0:
        raise ValueError(
            f"ty={ty} must divide the per-host device count {per_host} "
            f"so the output axis never crosses DCN")
    return Mesh(np.array(devs).reshape(dp, ty), axis_names=("dp", "ty"))


def is_multihost(mesh) -> bool:
    """True when `mesh` spans more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def local_rows(n_rows: int, mesh) -> tuple[int, int]:
    """[start, stop) of the rows this process owns when an (n_rows, ...)
    array is sharded over the mesh's 'dp' axis (process-major layout)."""
    import jax

    nproc = len({d.process_index for d in mesh.devices.flat})
    if n_rows % nproc:
        raise ValueError(f"{n_rows} rows not divisible by {nproc} processes")
    per = n_rows // nproc
    p = jax.process_index()
    return p * per, (p + 1) * per


def global_batch(mesh, *arrays):
    """Globally dp-sharded device arrays from host-replicated numpy data.

    Every process passes the SAME full array(s); each extracts its
    `local_rows` block and contributes it — no process materialises (or
    needs to hold on-device) more than its shard.  Row count must divide
    the total process count.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("dp"))
    out = []
    for a in arrays:
        a = np.asarray(a)
        lo, hi = local_rows(a.shape[0], mesh)
        out.append(jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(a[lo:hi]), a.shape))
    return out[0] if len(out) == 1 else tuple(out)


def fetch_params(tree):
    """Host numpy copies of (possibly ty-sharded) global parameter arrays.

    Works on every process without cross-process gathers: parameters are
    never sharded over the cross-process 'dp' axis, and 'ty' stays
    intra-host, so each process's addressable shards already cover every
    index of every leaf — they are just not marked fully-replicated."""
    import jax

    def fetch(x):
        if not isinstance(x, jax.Array) or x.is_fully_replicated:
            return np.asarray(x)
        out = np.empty(x.shape, dtype=x.dtype)
        seen = np.zeros(x.shape, dtype=bool)
        for s in x.addressable_shards:
            out[s.index] = np.asarray(s.data)
            seen[s.index] = True
        if not seen.all():
            raise ValueError(
                "leaf is sharded over a cross-process axis; parameters "
                "should only ever be 'ty'-sharded (parallel/mesh.py)")
        return out

    return jax.tree_util.tree_map(fetch, tree)


def psum_across_processes(mesh, vec):
    """Sum a per-process host vector across every process of `mesh`.

    Used by the multihost eval path (Trainer.compute_metrics): each process
    evaluates its row shard locally and contributes its metric accumulators
    here.  Implementation: each process writes its vector into the first of
    its (process-major) 'dp' rows of a global (dp, K) array, zeros
    elsewhere; a jitted sum over the dp axis with replicated output makes
    XLA insert the cross-process all-reduce.  All processes must call this
    in lockstep (it is a collective)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    vec = np.atleast_1d(np.asarray(vec, np.float64))
    nproc = len({d.process_index for d in mesh.devices.flat})
    if nproc == 1:
        return vec
    dp = mesh.shape["dp"]
    assert dp % nproc == 0, "global_mesh lays 'dp' out process-major"
    per = dp // nproc
    local = np.zeros((per,) + vec.shape, vec.dtype)
    local[0] = vec
    # enable_x64 so the accumulators actually cross the wire in f64 —
    # without it device_put canonicalizes float64 -> float32 and large
    # per-process sums (airline-scale ElogL, calibration conf sums) lose
    # ~1e-7 relative before the reduce
    with jax.enable_x64(True):
        sh = NamedSharding(mesh, P("dp", *([None] * vec.ndim)))
        garr = jax.make_array_from_process_local_data(
            sh, local, (dp,) + vec.shape)
        out = _psum_reduce(garr, mesh)
        return np.asarray(out.addressable_data(0), np.float64)


# cached jitted reduction: a fresh jax.jit(lambda ...) per call carries a
# fresh compile cache, so every compute_metrics()/validate_each boundary
# would recompile the identical sum (host-side tracing serializes on the
# single-CPU-core hosts this tier targets)
import functools


@functools.lru_cache(maxsize=8)
def _psum_reduce_for(mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda a: jnp.sum(a, axis=0),
                   out_shardings=NamedSharding(mesh, P()))


def _psum_reduce(garr, mesh):
    return _psum_reduce_for(mesh)(garr)


def replicate_global(mesh, tree):
    """Replicate a host pytree onto every device of a multi-process mesh
    (all processes must pass identical values — true for seeded inits)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x, x.shape)

    return jax.tree_util.tree_map(put, tree)
