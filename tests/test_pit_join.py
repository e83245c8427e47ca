"""pit_join (operators/cdc): version selection at boundaries, delete
gaps, pre-history facts, and the at-most-one-match invariant."""

from __future__ import annotations

from skyway_spark.operators.cdc import changelog_to_scd2, pit_join


def test_pit_semantics(spark):
    ch = spark.createDataFrame(
        [
            (1, 10, "U", "v1"),
            (1, 20, "U", "v2"),
            (1, 30, "D", None),   # delete gap [30, 40)
            (1, 40, "U", "v3"),
            (2, 15, "U", "w1"),
        ],
        "k long, seq long, op string, val string",
    )
    hist = changelog_to_scd2(ch, ["k"])
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 19), (103, 1, 20),
         (104, 1, 35), (105, 1, 99), (106, 2, 15), (107, 3, 50)],
        "fid long, k long, at long",
    )
    got = {r.fid: r.val for r in pit_join(facts, hist, ["k"], "at").collect()}
    assert got == {
        101: "v1",   # boundary: valid_from inclusive
        102: "v1",
        103: "v2",   # switches exactly at the new version's seq
        105: "v3",   # open current interval
        106: "w1",
    }
    # fid 100 (pre-history), 104 (delete gap), 107 (unknown key) drop
    # and every fact matched at most once
    assert pit_join(facts, hist, ["k"], "at").count() == len(got)
