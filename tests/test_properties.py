"""Property-based tests (hypothesis): engine operators vs independent
pure-Python models on randomized inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.operators.sessions import sessionize
from kafka_clickhouse_implementation_spark.schemas import EVENTS_SCHEMA

TOKEN = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


def _py_rolling_hash(tokens: list[str]) -> int:
    h = 0
    for t in tokens:
        h = (h * 131 + len(t) * 7 + ord(t[0])) % 1000000007
    return h


@settings(max_examples=5, deadline=None)
@given(st.lists(TOKEN, min_size=1, max_size=12))
def test_rolling_hash_matches_python_model(tokens):
    # model only — the Spark twin is asserted once below on a batch
    h = _py_rolling_hash(tokens)
    assert 0 <= h < 1000000007


def test_rolling_hash_spark_vs_python(spark):
    import random

    random.seed(7)
    docs = [
        (i, " ".join(random.choice("ab cd efg hi jkl".split()) for _ in range(random.randint(1, 20))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tok_vals = F.transform(
        F.split("text", " "), lambda t: (F.length(t) * 7 + F.ascii(t)).cast("long")
    )
    roll = F.aggregate(tok_vals, F.lit(0).cast("long"), lambda a, x: (a * 131 + x) % 1000000007)
    got = {r["doc_id"]: r["h"] for r in df.select("doc_id", roll.alias("h")).collect()}
    want = {i: _py_rolling_hash(t.split(" ")) for i, t in docs}
    assert got == want


def _py_sessions(times: list[int], gap_s: int = 1800) -> int:
    n = 0
    prev = None
    for t in sorted(times):
        if prev is None or t - prev > gap_s:
            n += 1
        prev = t
    return n


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200_000), min_size=1, max_size=30, unique=True)
)
def test_sessionize_matches_python_model_prop(spark, times):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=t), 1, "click", 1.0, None)
        for i, t in enumerate(times)
    ]
    ev = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    got = sessionize(ev).agg(F.max("session_id").alias("m")).head()["m"]
    assert got == _py_sessions(times)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.data(),
)
def test_png_roundtrip_property(width, height, data):
    """Any RGB8 image with any per-row filter assignment must survive
    the encode→(zlib inflate + unfilter)→decode round trip exactly —
    the pure-Python property behind q_multimodal_png's oracle check."""
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        encode_png,
        parse_png,
    )

    px = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=3 * width * height,
            max_size=3 * width * height,
        )
    )
    filters = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4),
            min_size=height,
            max_size=height,
        )
    )
    dec = parse_png(encode_png(width, height, px, filters))
    assert (dec["width"], dec["height"]) == (width, height)
    assert dec["values"] == px


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=17),
    st.integers(min_value=1, max_value=17),
    st.data(),
)
def test_png_adam7_roundtrip_property(width, height, data):
    """Any RGB8 image must survive the Adam7 interlaced round trip
    exactly, for every geometry class (empty passes at tiny sizes,
    ceil-division edges at 8k±1) — the property behind
    q_multimodal_png_adam7's oracle check. The interlaced and
    sequential decodes must also agree with each other."""
    from kafka_clickhouse_implementation_spark.operators.multimodal import (
        encode_png,
        encode_png_adam7,
        parse_png,
    )

    px = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=3 * width * height,
            max_size=3 * width * height,
        )
    )
    dec = parse_png(encode_png_adam7(width, height, px))
    assert (dec["width"], dec["height"]) == (width, height)
    assert dec["values"] == px
    assert dec["values"] == parse_png(encode_png(width, height, px))["values"]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30))
def test_ema_fold_model(vals):
    """The alpha=1/2 EMA fold is exactly reproducible: seeded by x0,
    each step 0.5*x + 0.5*acc; folding the same sequence twice (or in
    two chunks carrying the scalar state across, as the streaming twin
    does) gives bit-identical doubles."""
    def fold(seq, acc=None):
        for x in seq:
            acc = x if acc is None else 0.5 * x + 0.5 * acc
        return acc

    whole = fold(vals)
    for cut in (1, len(vals) // 2, len(vals)):
        assert fold(vals[cut:], fold(vals[:cut])) == whole
