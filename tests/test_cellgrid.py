"""Cell-grid neighbor search vs the brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from dieselfluid_tpu.config import FluidParams
from dieselfluid_tpu.models import field as F
from dieselfluid_tpu.neighbors.bruteforce import brute_force_neighborhood
from dieselfluid_tpu.neighbors.cellgrid import (
    CellGridSpec,
    build_cell_table,
    cell_grid_neighborhood,
    cell_id,
    overflow_fraction,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    n = 500
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    h = 0.3
    spec = CellGridSpec.for_domain((-1, -1, -1), (1, 1, 1), h, capacity=32)
    return pos, h, spec


def _neighbor_sets(nb, n, m):
    """Boolean (n, m) membership matrix from a Neighborhood."""
    out = np.zeros((n, m), dtype=bool)
    idx = np.asarray(nb.idx)
    mask = np.asarray(nb.mask) > 0
    for i in range(n):
        out[i, idx[i][mask[i]]] = True
    return out


def test_cell_table_partitions_particles(setup):
    pos, h, spec = setup
    order, starts = build_cell_table(pos, spec)
    assert sorted(np.asarray(order).tolist()) == list(range(pos.shape[0]))
    counts = np.asarray(starts[1:] - starts[:-1])
    assert counts.sum() == pos.shape[0]
    # every particle's cell contains it
    cid = np.asarray(cell_id(pos, spec))
    sorted_cid = cid[np.asarray(order)]
    assert (np.diff(sorted_cid) >= 0).all()


def test_matches_bruteforce_exactly(setup):
    pos, h, spec = setup
    k = 64
    nb_cg = cell_grid_neighborhood(pos, pos, h, k, spec)
    nb_bf = brute_force_neighborhood(pos, pos, h, k)
    n = pos.shape[0]
    assert float(overflow_fraction(pos, spec)) == 0.0
    sets_cg = _neighbor_sets(nb_cg, n, n)
    sets_bf = _neighbor_sets(nb_bf, n, n)
    mismatches = (sets_cg != sets_bf).sum()
    # Borderline r~h pairs may differ in the last float32 ulp between the two
    # distance computations; require identical sets (both use direct diffs).
    assert mismatches == 0, f"{mismatches} membership mismatches"


def test_density_equivalence(setup):
    pos, h, spec = setup
    params = FluidParams(h=h, mass=1.0, d0=100.0)
    nb_cg = cell_grid_neighborhood(pos, pos, h, 64, spec)
    nb_bf = brute_force_neighborhood(pos, pos, h, 64)
    rho_cg = np.asarray(F.density(pos, nb_cg, params))
    rho_bf = np.asarray(F.density(pos, nb_bf, params))
    np.testing.assert_allclose(rho_cg, rho_bf, rtol=1e-5, atol=1e-5)


def test_capacity_overflow_is_detectable(setup):
    pos, h, _ = setup
    tight = CellGridSpec.for_domain((-1, -1, -1), (1, 1, 1), h, capacity=1)
    assert float(overflow_fraction(pos, tight)) > 0.0


def test_self_offset_for_shards(setup):
    pos, h, spec = setup
    n = pos.shape[0]
    half = n // 2
    query = pos[half:]
    nb = cell_grid_neighborhood(query, pos, h, 64, spec, self_offset=half)
    idx = np.asarray(nb.idx)
    mask = np.asarray(nb.mask) > 0
    rows = np.arange(half, n)[:, None]
    assert not np.any((idx == rows) & mask), "self pair leaked through"


def test_out_of_domain_particles_clip(setup):
    _, h, spec = setup
    pos = jnp.asarray([[-5.0, 0.0, 0.0], [5.0, 5.0, 5.0], [0.0, 0.0, 0.0]], jnp.float32)
    nb = cell_grid_neighborhood(pos, pos, h, 8, spec)
    assert bool(jnp.all(jnp.isfinite(nb.mask)))
