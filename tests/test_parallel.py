"""Multi-chip update step: N-device mesh result == 1-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meshclust_tpu.parallel import mesh as M


def _problem(rng, Mn, V=64, C=6):
    hist = rng.integers(1, 9, size=(Mn, V)).astype(np.float32)
    mag = hist.sum(1)
    sq = (hist ** 2).sum(1)
    lens = rng.integers(200, 400, size=Mn).astype(np.float32)
    assign = np.sort(rng.integers(0, C, size=Mn)).astype(np.int32)
    gid = np.arange(Mn, dtype=np.int32)
    c_rows = rng.integers(0, Mn, size=C)
    import __graft_entry__ as g
    _, _, _, _, params = g._toy_model(V=V)
    prm = M.ClassifierParams(
        mins=jnp.asarray(params.mins, jnp.float32),
        maxs=jnp.asarray(params.maxs, jnp.float32),
        is_sim=jnp.asarray(params.is_sim),
        weights=jnp.asarray(params.weights, jnp.float32))
    return hist, mag, sq, lens, assign, gid, c_rows, prm


def _run(n_dev, data):
    hist, mag, sq, lens, assign, gid, c_rows, prm = data
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devs), axis_names=("data",))
    singles, combos = M.default_combo_structure()
    step = M.make_update_step(mesh, V=hist.shape[1], delta=2,
                              singles=singles, combos=combos)
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(x, dsh) for x in
            (hist, mag, sq, lens, assign, gid)]
    args += [jax.device_put(x, rep) for x in
             (hist[c_rows], mag[c_rows], sq[c_rows], lens[c_rows])]
    gid_out, gmin, mean = step(*args, prm)
    return np.asarray(gid_out), np.asarray(gmin), np.asarray(mean)


def test_sharded_update_deterministic_across_mesh_sizes(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    data = _problem(rng, Mn=64)
    g1, d1, m1 = _run(1, data)
    g8, d8, m8 = _run(8, data)
    np.testing.assert_array_equal(g1, g8)
    np.testing.assert_allclose(d1, d8, rtol=1e-6)
    np.testing.assert_allclose(m1, m8, rtol=1e-6)


def test_sharded_update_picks_members(rng):
    data = _problem(rng, Mn=32)
    g, d, m = _run(1, data)
    assign = data[4]
    for c in range(6):
        if np.isfinite(d[c]):
            # winner must be a member within the delta band of center c
            a = assign[g[c]]
            assert abs(int(a) - c) <= 2
