"""The scan-compiled hypernet anchor fit matches the per-step host loop.

fit_hypernet_to_anchors used to dispatch one device program per
(epoch, batch) step — 345-1063 s of init over a remote-chip tunnel for a
31 s training run.  The scan path replays the host loop's rng split
sequence exactly; this pins the two trajectories against each other (same
optimizer, same draws) so the fast path can never drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp.pytorch_tpu.flows import generators as G
from tgp.pytorch_tpu.flows.core import init_flow_params, spec_from_list
from tgp.pytorch_tpu.flows.initializers import fit_hypernet_to_anchors


@pytest.mark.parametrize("inference", ["MC_dropout", "mean_field_gaussian"])
def test_scan_path_matches_host_loop(inference):
    kw = dict(input_dependent=True, input_dim=3, hidden_dim=8,
              num_hidden_layers=1, hidden_activation="relu",
              inference=inference)
    if inference == "MC_dropout":
        kw["dropout"] = 0.5
    spec, inits = spec_from_list(G.SAL(1, **kw))
    params = init_flow_params(spec, inits, key=jax.random.PRNGKey(3))

    rng = np.random.RandomState(0)
    batches = [rng.randn(16, 3).astype(np.float32) for _ in range(3)]

    p_scan, l_scan = fit_hypernet_to_anchors(
        spec, params, batches, num_epochs=7, use_scan=True)
    p_host, l_host = fit_hypernet_to_anchors(
        spec, params, batches, num_epochs=7, use_scan=False)

    assert np.isfinite(l_scan) and np.isfinite(l_host)
    np.testing.assert_allclose(l_scan, l_host, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_scan),
                    jax.tree_util.tree_leaves(p_host)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ragged_batches_fall_back():
    spec, inits = spec_from_list(G.SAL(1, input_dependent=True, input_dim=2,
                                       hidden_dim=4, dropout=0.5,
                                       inference="MC_dropout"))
    params = init_flow_params(spec, inits, key=jax.random.PRNGKey(0))
    batches = [np.zeros((8, 2), np.float32), np.zeros((5, 2), np.float32)]
    p, loss = fit_hypernet_to_anchors(spec, params, batches, num_epochs=2)
    assert np.isfinite(loss)
    with pytest.raises(ValueError):
        fit_hypernet_to_anchors(spec, params, batches, num_epochs=1,
                                use_scan=True)
