"""Onion decomposition (operators/kcore.onion_layers) — hand-checked layers.

Fixture: 4-clique {0,1,2,3} + pendant chain 3-4-5 (fixtures.clique_pendant).
Peel trace: round 1 removes node 5 (k=1), round 2 removes node 4 (its degree
dropped to 1; k stays 1), round 3 removes the whole clique at once (min degree
jumps to 3, k ratchets to 3). Layer = removal round, core = k at removal —
the clique's core number 3 matches the classic k-core result while the chain
is split across two layers the plain peel cannot distinguish.
"""

from __future__ import annotations

from kaminpar_spark import fixtures
from kaminpar_spark.operators.kcore import onion_layers


def test_onion_clique_pendant(spark):
    g = fixtures.clique_pendant(spark)
    got = {r["id"]: (r["layer"], r["core"]) for r in onion_layers(g, 6).collect()}
    assert got[5] == (1, 1)
    assert got[4] == (2, 1)
    for v in range(4):
        assert got[v] == (3, 3)
    assert len(got) == 6


def test_onion_round_budget_is_partial(spark):
    g = fixtures.clique_pendant(spark)
    got = {r["id"]: r["layer"] for r in onion_layers(g, 2).collect()}
    assert got == {5: 1, 4: 2}


def test_onion_layers_refine_core_numbers(spark):
    """Within one core value, layers are contiguous removal waves; every
    node's onion core equals its h-index core number."""
    from kaminpar_spark.operators.kcore import core_numbers

    g = fixtures.clique_pendant(spark)
    onion = {r["id"]: r["core"] for r in onion_layers(g, 6).collect()}
    cores = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    assert onion == cores
