"""Horn-rule mining (operators/rules.py)."""

import pytest

from distributed_extraction_framework_spark.operators.rules import (
    apply_rules,
    mine_chain_rules,
    mine_rules,
)


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        # cityIn(x,y) on 4 pairs; capitalOf on 2 of them -> conf(capitalOf<=cityIn)=0.5
        ("a1", "cityIn", "b1"), ("a2", "cityIn", "b2"),
        ("a3", "cityIn", "b3"), ("a4", "cityIn", "b4"),
        ("a1", "capitalOf", "b1"), ("a2", "capitalOf", "b2"),
        # spouse symmetric on one pair, one-directional on another
        ("s1", "spouse", "s2"), ("s2", "spouse", "s1"),
        ("s3", "spouse", "s4"),
        # chain: parent(x,z) + parent(z,y) => grandparent(x,y)
        ("g1", "parent", "m1"), ("m1", "parent", "c1"),
        ("g2", "parent", "m2"), ("m2", "parent", "c2"),
        ("g1", "grandparent", "c1"),
        # duplicate triple must not inflate counts
        ("a1", "cityIn", "b1"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_mine_rules_fwd_confidence(kg):
    rules = {(r.head, r.body, r.direction): r for r in mine_rules(kg).collect()}
    r = rules[("capitalOf", "cityIn", "fwd")]
    assert r.support == 2 and r.body_size == 4
    assert r.confidence == 0.5 and r.head_coverage == 1.0
    # the converse rule holds with confidence 1.0
    assert rules[("cityIn", "capitalOf", "fwd")].confidence == 1.0


def test_mine_rules_inverse_detects_symmetry(kg):
    rules = {(r.head, r.body, r.direction): r for r in mine_rules(kg).collect()}
    sym = rules[("spouse", "spouse", "inv")]
    assert sym.support == 2          # (s1,s2) and (s2,s1)
    assert sym.body_size == 3
    # fwd head==body tautology is excluded
    assert ("spouse", "spouse", "fwd") not in rules


def test_mine_rules_thresholds(kg):
    got = mine_rules(kg, min_support=2, min_confidence=0.9).collect()
    assert all(r.support >= 2 and r.confidence >= 0.9 for r in got)
    assert ("cityIn", "capitalOf") in {(r.head, r.body) for r in got}


def test_mine_chain_rules(kg):
    rules = {(r.head, r.body1, r.body2): r
             for r in mine_chain_rules(kg).collect()}
    r = rules[("grandparent", "parent", "parent")]
    assert r.support == 1 and r.body_size == 2
    assert r.confidence == 0.5


def test_chain_degree_cap_drops_hub(spark):
    rows = [("x%d" % i, "p", "hub") for i in range(5)]
    rows += [("hub", "q", "y%d" % i) for i in range(5)]
    rows += [("x0", "r", "y0")]
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")
    uncapped = mine_chain_rules(kg)
    assert uncapped.filter("body1 = 'p' AND body2 = 'q'").count() > 0
    capped = mine_chain_rules(kg, max_z_degree=3)
    assert capped.filter("body1 = 'p' AND body2 = 'q'").count() == 0


def test_apply_rules_predicts_missing_only(kg):
    rules = mine_rules(kg)
    pred = apply_rules(kg, rules, min_confidence=0.9).collect()
    got = {(r.subj, r.pred, r.obj) for r in pred}
    # spouse symmetry (conf 2/3) is below 0.9; cityIn<=capitalOf (1.0)
    # predicts nothing new (all capitals already have cityIn) — but
    # capitalOf<=cityIn at 0.5 is filtered out.
    assert ("a3", "capitalOf", "b3") not in got
    pred_low = {(r.subj, r.pred, r.obj)
                for r in apply_rules(kg, rules, min_confidence=0.4).collect()}
    assert ("a3", "capitalOf", "b3") in pred_low
    assert ("s4", "spouse", "s3") in pred_low      # via the inv rule
    assert ("a1", "capitalOf", "b1") not in pred_low  # already known
