"""Registry synchronization invariants (the reference's
registry/CLI-parity pattern, reference tests/test_registry_cli_sync.py):
every oracle has a query, every kernel runs, every query is callable
with the (spark, sf_dir) signature."""

import inspect

import numpy as np

from fujishadergpu_spark.operators.tile_kernels import KERNELS
from fujishadergpu_spark.queries import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_query_signatures():
    for name, fn in QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], name


def test_every_kernel_runs_on_synthetic_grid():
    rng = np.random.RandomState(42)
    g = rng.rand(40, 40)
    for name, (fn, depth) in KERNELS.items():
        out = fn(g)
        assert out.shape == g.shape, name
        assert np.isfinite(out).all(), name
        assert depth >= 1, name


def test_oracles_are_single_statements():
    for name, sql in ORACLES.items():
        assert ";" not in sql.strip().rstrip(";"), name
