"""Fuzzy entity resolution (operators/entity.py): planted single-end
edits are recovered exactly; best-match equals an O(n·m) brute-force
reference whenever the edit leaves one 4-char block intact."""

from __future__ import annotations

from ark_invest_api_rust_data_spark.operators.entity import fuzzy_best_match

CATALOG = [
    (1, "golden widget"),
    (2, "silver sprocket"),
    (3, "copper flange"),
    (4, "golden widgets"),  # near-collision with 1
    (5, "bronze coupling"),
]


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def _brute_best(dirty, catalog, max_dist=2):
    out = {}
    for did, dn in dirty:
        cands = [
            (
                _lev(dn, cn),
                cid,
                cn,
            )
            for cid, cn in catalog
            # blocking recall contract: prefix OR suffix block intact
            if dn[:4] == cn[:4] or dn[-4:] == cn[-4:]
        ]
        cands = [c for c in cands if c[0] <= max_dist]
        if cands:
            d, cid, cn = min(cands)
            out[did] = (cid, d)
    return out


def test_planted_edits_recovered(spark):
    dirty = [
        (101, "golden widge"),    # dropped last char of 1
        (102, "xilver sprocket"),  # first char replaced in 2
        (103, "copper flange"),    # exact
        (104, "zzz unrelated"),    # no match
    ]
    d = spark.createDataFrame(dirty, ["dirty_id", "dirty_name"])
    c = spark.createDataFrame(CATALOG, ["match_id", "match_name"])
    got = {
        r["dirty_id"]: (r["match_id"], r["dist"])
        for r in fuzzy_best_match(d, c).collect()
    }
    assert got == _brute_best(dirty, CATALOG)
    assert got[101] == (1, 1)  # beats "golden widgets" (dist 2) on dist
    assert got[102] == (2, 1)
    assert got[103] == (3, 0)
    assert 104 not in got


def test_matches_bruteforce_on_generated_edits(spark):
    catalog = [(i, f"part number {i:04d} alpha") for i in range(50)]
    dirty = []
    for i, name in catalog:
        if i % 3 == 0:
            dirty.append((1000 + i, name[:-1]))       # end edit
        elif i % 3 == 1:
            dirty.append((1000 + i, "q" + name[1:]))  # start edit
        else:
            dirty.append((1000 + i, name))
    d = spark.createDataFrame(dirty, ["dirty_id", "dirty_name"])
    c = spark.createDataFrame(catalog, ["match_id", "match_name"])
    got = {
        r["dirty_id"]: (r["match_id"], r["dist"])
        for r in fuzzy_best_match(d, c).collect()
    }
    assert got == _brute_best(dirty, catalog)
    assert len(got) == len(dirty)  # every planted edit recovered
