"""Round-8 operator tests: two-tier entity resolution, trained quality
classifier, URL canonicalization, index maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---------------------------------------------------- two-tier ER equivalence


def _write_part(tmp_path, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name", "p_brand"])
    pdf.to_parquet(tmp_path / "part.parquet")
    return str(tmp_path)


def test_part_er_two_tier_matches_part_level_closure(spark, tmp_path):
    """The two-tier build (identity-class stars + rep-level Jaccard
    edges) must produce EXACTLY the part-level transitive closure the
    pre-round-8 all-pairs blocking computed — on a corpus that has
    BOTH tiers: an identity class, a cross-signature 4-of-5-token
    match bridging into it, an unmatched part, and a same-name part
    under a different brand (blocking must keep brands apart)."""
    from options_data_pipeline_spark import registry

    sf = _write_part(
        tmp_path,
        [
            (1, "alpha beta gamma delta epsilon", "Brand#A"),
            (2, "alpha beta gamma delta epsilon", "Brand#A"),  # identity dup
            (3, "epsilon delta gamma beta alpha", "Brand#A"),  # reordered dup
            (4, "alpha beta gamma delta zeta", "Brand#A"),  # 4/6 = 0.667 match
            (5, "one two three four five", "Brand#A"),  # no match
            (6, "alpha beta gamma delta epsilon", "Brand#B"),  # other brand
        ],
    )
    got = {
        (r.p_partkey, r.entity_id, r.cluster_size)
        for r in registry.queries()["part_entity_resolution"](spark, sf).collect()
    }
    # 1-2-3 identity class, 4 bridges in via the rep edge; 5 and 6 have
    # no matching pair so (like the original query) they emit no row
    assert got == {(1, 1, 4), (2, 1, 4), (3, 1, 4), (4, 1, 4)}

    # cross-engine: the recursive-CTE oracle reaches the same fixpoint
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
    oracle = {
        tuple(r)
        for r in con.execute(
            registry.oracle_sql()["part_entity_resolution"]
        ).fetchall()
    }
    assert oracle == got


def test_part_er_hot_token_cap_drops_key_not_recall(spark, tmp_path):
    """A rep-grain token hotter than df=64 is a stop-key: candidates
    through it are dropped (bounded work), but pairs that ALSO share a
    cool token still match — and the audit reports the fire."""
    from options_data_pipeline_spark import registry

    rows = [
        # 70 distinct signatures all sharing the hot token "hot"
        (i, f"hot uniq{i} filler{i} pad{i} tail{i}", "Brand#A")
        for i in range(1, 71)
    ]
    # two parts sharing hot AND 4 cool tokens (J = 4/6 via cool tokens
    # alone is impossible — they must match through the full 5-set:
    # share all of cool1..cool4 => J = 4/6 >= 0.6 even without "hot")
    rows += [
        (100, "hot cool1 cool2 cool3 cool4", "Brand#A"),
        (101, "warm cool1 cool2 cool3 cool4", "Brand#A"),
    ]
    sf = _write_part(tmp_path, rows)
    qs = registry.queries()
    got = {
        (r.p_partkey, r.entity_id)
        for r in qs["part_entity_resolution"](spark, sf).collect()
    }
    # the hot-token-only candidates are capped away (uniq tokens differ);
    # 100-101 still pair through their four sub-cap cool-token keys
    assert got == {(100, 100), (101, 100)}
    audit = {r.p_brand: r for r in qs["entity_blocking_audit"](spark, sf).collect()}
    a = audit["Brand#A"]
    assert a.n_capped_keys == 1  # "hot" (df = 71 > 64)
    assert a.postings_dropped == 71
    assert a.max_rep_df == 71
