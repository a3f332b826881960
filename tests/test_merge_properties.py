"""Property-based tests (hypothesis): the lake's keyed-upsert merge
semantics against a pure-Python oracle, over random batch sequences —
the engine analog of DefaultHoodieRecordPayload (larger precombine wins,
ties -> newer write; SRC/package.scala:25,35)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = [0, 1, 2, 3]

row = st.tuples(
    st.sampled_from(KEYS),                    # record key
    st.integers(min_value=0, max_value=5),    # precombine version
    st.integers(min_value=0, max_value=99),   # payload
)
batch = st.lists(row, min_size=0, max_size=6)


def python_oracle(batches: list[list[tuple]]) -> dict:
    """Reference semantics (DefaultHoodieRecordPayload): an incoming row
    replaces the stored row iff its precombine is >= the stored one
    (ties -> incoming). Within ONE batch, equal-precombine duplicates
    are engine-arbitrary (Hudi makes no guarantee either), so the oracle
    tracks the SET of admissible payloads per key."""
    state: dict[int, tuple[int, set]] = {}
    for b in batches:
        dedup: dict[int, tuple[int, set]] = {}
        for k, ver, payload in b:
            if k not in dedup or ver > dedup[k][0]:
                dedup[k] = (ver, {payload})
            elif ver == dedup[k][0]:
                dedup[k][1].add(payload)
        for k, (ver, payloads) in dedup.items():
            if k not in state or ver >= state[k][0]:
                state[k] = (ver, payloads)
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch, min_size=1, max_size=3))
def test_upsert_matches_python_oracle(spark, tmp_path_factory, batches):
    from emr_hudi_example_spark.lake import LakeTable

    tmp = tmp_path_factory.mktemp("prop")
    t = LakeTable(spark, str(tmp), "p", "t", ["k"], "ver")
    for i, b in enumerate(batches):
        df = spark.createDataFrame(
            [(k, v, p) for k, v, p in b] or [(None, None, None)],
            "k INT, ver INT, payload INT",
        )
        t.write(df, op="upsert", instant=f"{i + 1:03d}")
    rows = [r for r in t.snapshot().collect() if r["k"] is not None]
    assert len(rows) == len({r["k"] for r in rows})  # key uniqueness
    expected = python_oracle(batches)
    got = {r["k"]: (r["ver"], r["payload"]) for r in rows}
    assert set(got) == set(expected)
    for k, (ver, payload) in got.items():
        assert ver == expected[k][0], f"key {k}: wrong surviving version"
        assert payload in expected[k][1], f"key {k}: inadmissible payload"


# ------------------------------------------------------- as-of join property


asof_left = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=20)),
    min_size=1, max_size=12,
)
asof_right = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=20)),
    min_size=0, max_size=12,
)


def _asof_oracle(left, right):
    """Newest right time ≤ left time per key (unique right rows)."""
    out = []
    for k, t in left:
        prior = [rt for rk, rt in right if rk == k and rt <= t]
        out.append((k, t, max(prior) if prior else None))
    return sorted(out)


@given(asof_left, asof_right)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_asof_matches_python_oracle(spark, left, right):
    from emr_hudi_example_spark.operators.relational import join_asof

    right = sorted(set(right))  # operator contract: unique (key, time)
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k STRING, t LONG, rowid LONG",
    )
    rdf = spark.createDataFrame(
        right or [("zzz", -1)], "k STRING, rt LONG"
    ).withColumn("state", F.col("rt"))
    got = sorted(
        (r["k"], r["t"], r["state"])
        for r in join_asof(
            ldf, rdf, ["k"], "t", "rt", ["state"]
        ).collect()
    )
    assert got == _asof_oracle(left, right)
