"""Driver-boundary schema contract: the correctness harness's pandas
canonicalizer sorts result rows by every column, which raises
``TypeError: unhashable type`` on cells holding Python lists/dicts
(CORRECTNESS_r03: q_sum_map and q_inverted_index ERRed this way).

Guard: NO registered query may emit ArrayType/MapType/StructType
columns. Array-native operators stay in the library (e.g.
``funnels.sum_map``, ``text_ext.inverted_index``); their ``queries()``
wrappers serialize to comma-joined strings / unpacked scalars at the
boundary.

Building every DataFrame executes the streaming queries' hermetic
drains, so this test is the slowest in the suite — but it is the only
thing that can catch a reintroduction BEFORE the driver's round runs.
"""

from __future__ import annotations

from kafka_clickhouse_implementation_spark.registry import all_queries

_NON_SCALAR = {"array", "map", "struct"}


def test_no_non_scalar_columns_in_any_registered_query(spark, sf_dir):
    offenders: dict[str, list[tuple[str, str]]] = {}
    failures: dict[str, str] = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # build error is its own finding
            failures[name] = repr(e)[:200]
            continue
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.typeName() in _NON_SCALAR
        ]
        if bad:
            offenders[name] = bad
    assert failures == {}, f"queries failed to build: {failures}"
    assert offenders == {}, (
        "non-scalar result columns crash the driver canonicalizer; "
        f"serialize at the boundary: {offenders}"
    )
