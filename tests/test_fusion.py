"""Knowledge fusion + statement lifecycle (operators/fusion.py)."""

import pyspark.sql.functions as F
import pytest

from distributed_extraction_framework_spark.operators.fusion import (
    RDF,
    change_events,
    conflict_report,
    reify_statements,
    resolve_functional,
    triple_intervals,
    truth_finder,
    unreify_statements,
    vote_values,
)


@pytest.fixture(scope="module")
def claims(spark):
    # e0.pop: h1,h2,h3 say "10"; h4 says "11"  -> winner 10 (3 votes)
    # e0.cap: h1 says "X"; h2 says "Y"         -> tie, winner X (obj ASC)
    # e1.pop: h4 says "9" (uncontested)
    rows = [
        ("h1", "e0", "pop", "10"), ("h2", "e0", "pop", "10"),
        ("h3", "e0", "pop", "10"), ("h4", "e0", "pop", "11"),
        ("h1", "e0", "cap", "X"), ("h2", "e0", "cap", "Y"),
        ("h4", "e1", "pop", "9"),
        # duplicate assertion from the same source must not double-count
        ("h1", "e0", "pop", "10"),
    ]
    return spark.createDataFrame(rows, "source string, subj string, pred string, obj string")


def test_vote_values_distinct_sources(claims):
    v = {(r.subj, r.pred, r.obj): r.votes for r in vote_values(claims).collect()}
    assert v[("e0", "pop", "10")] == 3
    assert v[("e0", "pop", "11")] == 1
    assert v[("e0", "cap", "X")] == 1


def test_resolve_functional_majority_and_ties(claims):
    got = {(r.subj, r.pred): r for r in resolve_functional(claims).collect()}
    assert got[("e0", "pop")].obj == "10"
    assert got[("e0", "pop")].votes == 3
    assert got[("e0", "pop")].n_values == 2
    assert got[("e0", "pop")].n_sources == 4
    # tie at 1 vote each -> lexicographic min object wins
    assert got[("e0", "cap")].obj == "X"
    assert got[("e1", "pop")].n_values == 1


def test_conflict_report_only_disagreements(claims):
    rep = {(r.subj, r.pred): r for r in conflict_report(claims).collect()}
    assert set(rep) == {("e0", "pop"), ("e0", "cap")}
    assert rep[("e0", "pop")].values == "10:3|11:1"
    assert rep[("e0", "cap")].values == "X:1|Y:1"


def test_truth_finder_downweights_contrarian(spark):
    # h_bad disagrees with the 3-source majority on every key; after two
    # rounds its trust collapses and majorities win with conf > 0.75.
    rows = []
    for k in range(6):
        for h in ("h1", "h2", "h3"):
            rows.append((h, f"e{k}", "p", "good"))
        rows.append(("h_bad", f"e{k}", "p", "bad"))
    df = spark.createDataFrame(rows, "source string, subj string, pred string, obj string")
    out = truth_finder(df, iterations=2).collect()
    assert len(out) == 6
    for r in out:
        assert r.obj == "good"
        assert r.conf > 0.75


def test_truth_finder_winner_is_majority_vote_when_uniform(claims):
    out = {(r.subj, r.pred): r.obj for r in truth_finder(claims, iterations=1).collect()}
    assert out[("e0", "pop")] == "10"
    assert out[("e0", "cap")] == "X"  # rounded-tie -> obj ASC


@pytest.fixture(scope="module")
def captures(spark):
    rows = [
        ("e0", "pop", "10", "2024-01-01"),
        ("e0", "pop", "10", "2024-02-01"),
        ("e0", "pop", "12", "2024-03-01"),   # value change
        ("e0", "name", "A", "2024-01-01"),   # vanished after Jan
        ("e1", "pop", "5", "2024-01-01"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_triple_intervals(captures):
    iv = {(r.subj, r.pred, r.obj): r for r in triple_intervals(captures).collect()}
    r = iv[("e0", "pop", "10")]
    assert str(r.first_seen)[:10] == "2024-01-01"
    assert str(r.last_seen)[:10] == "2024-02-01"
    assert r.n_captures == 2 and not r.is_current
    assert iv[("e0", "pop", "12")].is_current
    assert not iv[("e0", "name", "A")].is_current  # subject recrawled later
    assert iv[("e1", "pop", "5")].is_current       # latest capture OF e1


def test_change_events(captures):
    ev = change_events(captures).collect()
    by_key = {}
    for r in ev:
        by_key.setdefault((r.subj, r.pred), []).append((r.prev_obj, r.obj))
    assert by_key[("e0", "pop")] == [(None, "10"), ("10", "12")]
    assert by_key[("e0", "name")] == [(None, "A")]


def test_reify_roundtrip(spark):
    quads = spark.createDataFrame(
        [("s1", "p", "o1", "hostA"), ("s1", "p", "o1", "hostB"), ("s2", "p", "o2", "hostA")],
        "subj string, pred string, obj string, source string",
    )
    arcs = reify_statements(quads, source_col="source")
    # 2 statements x 4 core arcs + 3 distinct provenance arcs
    assert arcs.count() == 2 * 4 + 3
    per_stmt = arcs.groupBy("stmt").count().collect()
    assert sorted(r["count"] for r in per_stmt) == [5, 6]
    back = unreify_statements(arcs)
    assert sorted(map(tuple, back.collect())) == [("s1", "p", "o1"), ("s2", "p", "o2")]
    # statement ids are content hashes: re-reifying yields identical ids
    ids1 = sorted(r.stmt for r in arcs.select("stmt").distinct().collect())
    ids2 = sorted(
        r.stmt
        for r in reify_statements(quads.orderBy(F.rand(7)), source_col="source")
        .select("stmt").distinct().collect()
    )
    assert ids1 == ids2


def test_reify_without_source_has_core_arcs_only(spark):
    quads = spark.createDataFrame([("s", "p", "o")], "subj string, pred string, obj string")
    arcs = reify_statements(quads)
    assert arcs.count() == 4
    assert {r.pred for r in arcs.collect()} == {
        RDF + "type", RDF + "subject", RDF + "predicate", RDF + "object"
    }


def test_kg_as_of(captures):
    import pyspark.sql.functions as F
    from distributed_extraction_framework_spark.operators.fusion import kg_as_of

    snap_feb = {(r.subj, r.pred, r.obj)
                for r in kg_as_of(captures, "2024-02-15").collect()}
    # at Feb 15 the last observation of e0 is Feb 1: pop=10 valid;
    # name=A was absent from the Feb capture -> retracted
    assert ("e0", "pop", "10") in snap_feb
    assert ("e0", "name", "A") not in snap_feb
    assert ("e1", "pop", "5") in snap_feb
    snap_jan = {(r.subj, r.pred, r.obj)
                for r in kg_as_of(captures, "2024-01-15").collect()}
    assert ("e0", "name", "A") in snap_jan      # still valid in January
    snap_mar = {(r.subj, r.pred, r.obj)
                for r in kg_as_of(captures, "2024-03-15").collect()}
    assert ("e0", "pop", "12") in snap_mar
    assert ("e0", "pop", "10") not in snap_mar  # superseded


def test_temporal_reification_qualifiers_and_roundtrip(captures):
    from distributed_extraction_framework_spark.operators.fusion import (
        DEFS_VOC,
        temporal_reification,
        unreify_statements,
    )

    arcs = temporal_reification(captures)
    # 4 distinct statements x (4 core + 3 qualifier) arcs
    assert arcs.count() == 4 * 7
    by_stmt = {}
    for r in arcs.collect():
        by_stmt.setdefault(r.stmt, {})[r.pred] = r.obj
    cur = [q for q in by_stmt.values()
           if q[RDF + "subject"] == "e0" and q[RDF + "object"] == "12"][0]
    assert cur[DEFS_VOC + "isCurrent"] == "true"
    assert cur[DEFS_VOC + "firstSeen"].startswith("2024-03-01")
    old = [q for q in by_stmt.values()
           if q[RDF + "subject"] == "e0" and q[RDF + "object"] == "10"][0]
    assert old[DEFS_VOC + "isCurrent"] == "false"
    assert old[DEFS_VOC + "lastSeen"].startswith("2024-02-01")
    # unreify recovers the plain distinct triples despite the qualifiers
    back = sorted(map(tuple, unreify_statements(arcs).collect()))
    assert back == sorted(map(tuple, captures.select(
        "subj", "pred", "obj").distinct().collect()))


def test_incremental_resolve_matches_full_recompute(spark):
    from distributed_extraction_framework_spark.operators.fusion import (
        incremental_resolve,
        resolve_functional,
    )

    v1 = spark.createDataFrame(
        [("h1", "e0", "p", "a"), ("h2", "e0", "p", "a"),
         ("h1", "e1", "p", "x"),                      # will vanish in v2
         ("h1", "e2", "p", "m"), ("h2", "e2", "p", "m"),
         ("h1", "e3", "p", "k")],                     # untouched
        "source string, subj string, pred string, obj string")
    # v2: e0 gains a dissenting claim, e1's claims vanish, e2's majority
    # flips, e3 untouched
    v2 = spark.createDataFrame(
        [("h1", "e0", "p", "a"), ("h2", "e0", "p", "a"), ("h3", "e0", "p", "b"),
         ("h1", "e2", "p", "n"), ("h2", "e2", "p", "n"), ("h3", "e2", "p", "m"),
         ("h1", "e3", "p", "k")],
        "source string, subj string, pred string, obj string")
    delta = spark.createDataFrame(
        [("e0", "p"), ("e1", "p"), ("e2", "p")], "subj string, pred string")
    patched = incremental_resolve(resolve_functional(v1), v2, delta)
    full = resolve_functional(v2)
    assert sorted(map(tuple, patched.collect())) == sorted(
        map(tuple, full.collect()))
    got = {r.subj: r for r in patched.collect()}
    assert "e1" not in got                 # vanished key dropped
    assert got["e2"].obj == "n"            # flipped majority re-voted
    assert got["e3"].obj == "k"            # untouched row carried over
