"""HITS on directed edge tables (operators.hits) + the directed ETL."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaminpar_spark.operators.hits import HITS_SCALE, hits


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_hits_star(spark):
    """0 -> {1,2,3}: node 0 is the only hub; 1..3 are equal authorities."""
    e = _edges(spark, [(0, d, 1) for d in (1, 2, 3)])
    out = {r["id"]: r for r in hits(e, iters=3).collect()}
    assert out[0]["hub"] == HITS_SCALE and out[0]["auth"] == 0
    for d in (1, 2, 3):
        assert out[d]["auth"] == HITS_SCALE and out[d]["hub"] == 0


def test_hits_weight_sensitivity(spark):
    """Two hubs pointing at shared authorities; the heavier-outlink hub wins."""
    e = _edges(spark, [(0, 2, 3), (0, 3, 3), (1, 2, 1), (1, 3, 1)])
    out = {r["id"]: r for r in hits(e, iters=3).collect()}
    assert out[0]["hub"] == HITS_SCALE
    assert 0 < out[1]["hub"] < out[0]["hub"]
    assert out[2]["auth"] == out[3]["auth"] == HITS_SCALE


def test_hits_deterministic(spark):
    e = _edges(
        spark,
        [(i % 7, (i * 3 + 1) % 11, 1 + i % 4) for i in range(60)],
    ).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    e = e.where(F.col("src") != F.col("dst"))
    a = sorted(map(tuple, hits(e, iters=3).collect()))
    b = sorted(map(tuple, hits(e, iters=3).collect()))
    assert a == b
    assert all(0 <= r[1] <= HITS_SCALE and 0 <= r[2] <= HITS_SCALE for r in a)


def test_transcript_digraph_direction(spark):
    """The digraph keeps turn direction: user speaks at t=0 so user->agent
    edges exist; total directed weight equals the link count."""
    from kaminpar_spark.sources.transcripts import (
        synth_transcripts,
        transcript_digraph,
        turn_links,
    )

    t = synth_transcripts(spark, 30)
    edges, amap = transcript_digraph(t, 30, stable_ids=True)
    n_links = turn_links(t, 30).count()
    assert edges.agg(F.sum("weight")).first()[0] == n_links
    # direction asymmetry exists (some (u,v) without (v,u))
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    asym = edges.join(rev, ["src", "dst"], "left_anti").count()
    assert asym > 0


# ---------------------------------------------------------------- SALSA


def _salsa_brute(edge_list, weighted=False):
    """Closed-form SALSA via union-find over the bipartite support graph."""
    from collections import defaultdict

    w = defaultdict(int)
    for s, d, ww in edge_list:
        if s != d:
            if weighted:
                w[(s, d)] += ww
            else:
                w[(s, d)] = 1
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for (s, d) in w:
        union(("h", s), ("a", d))
    hub_num, auth_num = defaultdict(int), defaultdict(int)
    den = defaultdict(int)
    for (s, d), ww in w.items():
        hub_num[s] += ww
        auth_num[d] += ww
        den[find(("h", s))] += ww
    out = {}
    nodes = {x for s, d, _ in edge_list if s != d for x in (s, d)}
    for v in nodes:
        an = auth_num.get(v, 0)
        ad = den[find(("a", v))] if an else 1
        hn = hub_num.get(v, 0)
        hd = den[find(("h", v))] if hn else 1
        out[v] = (an, ad, hn, hd)
    return out


def test_salsa_two_components(spark):
    """Two disjoint hub->auth stars score within their own components."""
    from kaminpar_spark.operators.hits import salsa

    rows = [(0, 1, 1), (0, 2, 1), (5, 6, 1), (5, 7, 1), (5, 8, 1)]
    got = {r["id"]: (r["auth_num"], r["auth_den"], r["hub_num"], r["hub_den"])
           for r in salsa(_edges(spark, rows)).collect()}
    assert got == _salsa_brute(rows)
    # star centers are pure hubs with full component mass
    assert got[0] == (0, 1, 2, 2)
    assert got[5] == (0, 1, 3, 3)
    # leaves split authority mass evenly inside their star only
    assert got[1] == (1, 2, 0, 1) and got[6] == (1, 3, 0, 1)


def test_salsa_vs_brute_random(spark):
    from kaminpar_spark.operators.hits import salsa

    rows = [((i * 7 + 3) % 13, (i * 5 + 1) % 13, 1 + i % 3) for i in range(60)]
    rows = [r for r in rows if r[0] != r[1]]
    got = {r["id"]: (r["auth_num"], r["auth_den"], r["hub_num"], r["hub_den"])
           for r in salsa(_edges(spark, rows)).collect()}
    assert got == _salsa_brute(rows)


def test_salsa_shares_sum_to_one(spark):
    """Within every component the auth shares (and hub shares) sum to 1."""
    from fractions import Fraction

    from kaminpar_spark.operators.hits import salsa

    rows = [((i * 11 + 2) % 17, (i * 3 + 5) % 17, 1) for i in range(40)]
    rows = [r for r in rows if r[0] != r[1]]
    res = {r["id"]: r for r in salsa(_edges(spark, rows)).collect()}
    # recover the true bipartite components with union-find, then check
    # that each side's shares sum to exactly 1 per component
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in rows:
        ra, rb = find(("h", s)), find(("a", d))
        if ra != rb:
            parent[ra] = rb
    sums = {}
    for v, r in res.items():
        if r["auth_num"]:
            k = ("a", find(("a", v)))
            sums[k] = sums.get(k, 0) + Fraction(r["auth_num"], r["auth_den"])
        if r["hub_num"]:
            k = ("h", find(("h", v)))
            sums[k] = sums.get(k, 0) + Fraction(r["hub_num"], r["hub_den"])
    assert sums and all(s == 1 for s in sums.values())
