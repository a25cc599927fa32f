"""Pinot aggregate SQL spellings through the wire surface (functions/
aggsql.py): the rewrite is exact text surgery (literal-safe, arity-
checked), and every rewritten name answers through Engine.query / the
broker with the value its Spark equivalent gives."""

from __future__ import annotations

import pytest

from real_time_analytics_with_apache_pinot_on_aws_spark.engine import Engine
from real_time_analytics_with_apache_pinot_on_aws_spark.functions.aggsql import (
    rewrite_pinot_aggregates as R,
)


@pytest.mark.parametrize(
    "src,want",
    [
        ("SELECT DISTINCTCOUNT(u) FROM t", "SELECT count(DISTINCT u) FROM t"),
        ("SELECT distinctcounthll(u, 12) FROM t",
         "SELECT hll_sketch_estimate(hll_sketch_agg(u)) FROM t"),
        ("SELECT PERCENTILE(v, 90) FROM t", "SELECT percentile(v, 0.9) FROM t"),
        # Spark-style fractional percentile is NOT re-scaled
        ("SELECT percentile(v, 0.5) FROM t", "SELECT percentile(v, 0.5) FROM t"),
        # Pinot-only percentile names ALWAYS treat the arg as a percent
        ("SELECT PERCENTILEEST(v, 0.5) FROM t", "SELECT approx_percentile(v, 0.005) FROM t"),
        ("SELECT FIRSTWITHTIME(v, ts, 'DOUBLE') FROM t", "SELECT min_by(v, ts) FROM t"),
        ("SELECT MINMAXRANGE(v) FROM t GROUP BY g", "SELECT (max(v) - min(v)) FROM t GROUP BY g"),
        # a literal is data, not a call site
        ("SELECT 'DISTINCTCOUNT(u)' AS s FROM t", "SELECT 'DISTINCTCOUNT(u)' AS s FROM t"),
        # word boundary: a user function sharing the suffix is untouched
        ("SELECT MY_DISTINCTCOUNT(u) FROM t", "SELECT MY_DISTINCTCOUNT(u) FROM t"),
        # nested subquery arguments rewrite recursively
        (
            "SELECT x FROM (SELECT DISTINCTCOUNT(u) AS x FROM t)",
            "SELECT x FROM (SELECT count(DISTINCT u) AS x FROM t)",
        ),
    ],
)
def test_rewrite_text_cases(src, want):
    assert R(src) == want


def test_rewrite_arity_error_is_loud():
    with pytest.raises(ValueError, match="FIRSTWITHTIME"):
        R("SELECT FIRSTWITHTIME(v) FROM t")


@pytest.fixture(scope="module")
def agg_engine(spark, tmp_path_factory):
    spark.range(100).selectExpr(
        "id % 7 AS u",
        "cast(id * 1.5 as double) AS v",
        "id AS t",
        "array(id % 3, id % 5) AS arr",
    ).createOrReplaceTempView("aggsrc")
    return Engine(spark, str(tmp_path_factory.mktemp("wh")))


@pytest.mark.parametrize(
    "pinot,spark_equiv",
    [
        ("DISTINCTCOUNT(u)", "count(DISTINCT u)"),
        ("DISTINCTCOUNTBITMAP(u)", "count(DISTINCT u)"),
        ("DISTINCTCOUNTHLL(u)", "hll_sketch_estimate(hll_sketch_agg(u))"),
        ("DISTINCTCOUNTRAWHLL(u)", "hll_sketch_estimate(hll_sketch_agg(u))"),
        ("DISTINCTSUM(u)", "sum(DISTINCT u)"),
        ("DISTINCTAVG(u)", "avg(DISTINCT u)"),
        ("MINMAXRANGE(v)", "max(v) - min(v)"),
        ("FIRSTWITHTIME(v, t, 'DOUBLE')", "min_by(v, t)"),
        ("LASTWITHTIME(v, t, 'DOUBLE')", "max_by(v, t)"),
        ("PERCENTILE(v, 90)", "percentile(v, 0.9)"),
        ("PERCENTILETDIGEST(v, 50)", "approx_percentile(v, 0.5)"),
        ("SUMPRECISION(v)", "sum(cast(v as decimal(38,18)))"),
        ("COUNTMV(arr)", "sum(size(arr))"),
        ("SUMMV(arr)", "sum(aggregate(arr, cast(0.0 as double), (a, x) -> a + x))"),
        ("MINMV(arr)", "min(array_min(arr))"),
        ("MAXMV(arr)", "max(array_max(arr))"),
        ("AVGMV(arr)",
         "sum(aggregate(arr, cast(0.0 as double), (a, x) -> a + x)) / sum(size(arr))"),
        ("DISTINCTCOUNTMV(arr)", "size(array_distinct(flatten(collect_set(arr))))"),
        ("MINMAXRANGEMV(arr)", "max(array_max(arr)) - min(array_min(arr))"),
    ],
)
def test_pinot_agg_values_match_spark_equivalents(spark, agg_engine, pinot, spark_equiv):
    got = agg_engine.query(f"SELECT {pinot} AS x FROM aggsrc").collect()[0]["x"]
    want = spark.sql(f"SELECT {spark_equiv} AS x FROM aggsrc").collect()[0]["x"]
    assert got == want, (pinot, got, want)


def test_pinot_agg_group_by_through_broker_envelope(agg_engine):
    """The dashboard shape end-to-end: Pinot aggregate spellings inside a
    GROUP BY through query_broker_response — the exact SQL a Pinot console
    sends to POST /query/sql."""
    resp = agg_engine.query_broker_response(
        "SELECT u, DISTINCTCOUNT(t) AS d, MINMAXRANGE(v) AS r, "
        "LASTWITHTIME(v, t, 'DOUBLE') AS last_v "
        "FROM aggsrc GROUP BY u ORDER BY u LIMIT 3"
    )
    assert resp["exceptions"] == []
    schema = resp["resultTable"]["dataSchema"]
    assert schema["columnNames"] == ["u", "d", "r", "last_v"]
    rows = resp["resultTable"]["rows"]
    assert len(rows) == 3 and rows[0][0] == 0
    assert all(r[1] >= 14 for r in rows)  # ~100/7 timestamps per group


def test_pinot_agg_rewrite_keeps_codegen(spark, agg_engine):
    plan = (
        agg_engine.query("SELECT u, DISTINCTCOUNT(t) AS d FROM aggsrc GROUP BY u")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "pythonudf" not in plan.lower()
    assert "HashAggregate" in plan


# -- scalar call-site rewrites (literal-typed) --------------------------------


@pytest.mark.parametrize(
    "q,want",
    [
        # EPOCH->EPOCH with granularity bucketing: 90061000 ms = 1501.016
        # min; 15-min buckets floor to 1500 epoch-minutes
        ("SELECT DATETIMECONVERT(90061000, '1:MILLISECONDS:EPOCH', "
         "'1:MINUTES:EPOCH', '15:MINUTES') AS x", 1500),
        ("SELECT DATETIMECONVERT(90061000, '1:MILLISECONDS:EPOCH', "
         "'1:SECONDS:EPOCH', '1:HOURS') AS x", 90000),
        # SDF in / SDF out: return type follows the OUT format
        ("SELECT DATETIMECONVERT('2024-06-01 10:47:00', "
         "'1:SECONDS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:mm:ss', "
         "'1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd', '1:DAYS') AS x",
         "2024-06-01"),
        ('SELECT JSONEXTRACTSCALAR(\'{"a": {"b": 7}}\', \'$.a.b\', \'INT\') AS x', 7),
        ('SELECT JSONEXTRACTSCALAR(\'{"a": 1}\', \'$.miss\', \'LONG\', 42) AS x', 42),
        ('SELECT JSONEXTRACTSCALAR(\'{"n": "bob"}\', \'$.n\', \'STRING\', \'none\') AS x', "bob"),
    ],
)
def test_literal_typed_scalar_rewrites(agg_engine, q, want):
    assert agg_engine.query(q).collect()[0]["x"] == want


def test_datetimeconvert_requires_literal_formats(agg_engine):
    with pytest.raises(Exception, match="literal"):
        agg_engine.query(
            "SELECT DATETIMECONVERT(t, some_col, '1:MINUTES:EPOCH', "
            "'15:MINUTES') AS x FROM aggsrc"
        )


@pytest.mark.parametrize(
    "q,want",
    [
        ("SELECT TIMECONVERT(90061000, 'MILLISECONDS', 'SECONDS') AS x", 90061),
        ("SELECT TIMECONVERT(25, 'HOURS', 'DAYS') AS x", 1),
        ("SELECT ST_X(ST_GEOGFROMTEXT('POINT (-71.06 42.36)')) AS x", -71.06),
        ("SELECT ST_ASTEXT(ST_POINT(1.5, 2.5)) AS x", "POINT (1.5 2.5)"),
        ('SELECT JSONPATHLONG(\'{"a": {"b": 7}}\', \'$.a.b\') AS x', 7),
        ('SELECT JSONPATHARRAY(\'{"t": ["x","y"]}\', \'$.t\') AS x', ["x", "y"]),
        ("SELECT ISSUBNETOF('192.168.0.0/24', '192.168.0.5') AS x", True),
        ("SELECT ISSUBNETOF('192.168.0.0/24', '192.168.1.5') AS x", False),
        ("SELECT ISSUBNETOF('0.0.0.0/0', '8.8.8.8') AS x", True),
        ("SELECT ISSUBNETOF('10.0.0.0/8', '11.0.0.1') AS x", False),
        ("SELECT ROUNDDECIMAL(1.2345, 2) AS x", 1.23),
    ],
)
def test_pinot_exact_scalar_macros(agg_engine, q, want):
    assert agg_engine.query(q).collect()[0]["x"] == want


def test_st_distance_two_point_signature(agg_engine):
    # one degree of latitude on the mean sphere ~ 111.195 km
    got = agg_engine.query(
        "SELECT ST_DISTANCE(ST_POINT(0.0, 0.0), ST_POINT(0.0, 1.0)) AS x"
    ).collect()[0]["x"]
    assert abs(got - 111194.9) < 200


def test_straggler_pinot_spellings(agg_engine):
    """Round-6 battery stragglers: AGO (java.time.Duration parse — exactly
    the D/H/M/S subset Duration itself accepts), TEXTCONTAINS,
    REGEXPEXTRACT, ARRAYCONCAT*, TOJSONMAPSTR, DISTINCTCOUNTRAWHLL."""
    import time as _t

    r = agg_engine.query("SELECT AGO('P1DT2H') AS x").collect()[0]["x"]
    assert abs(r - (_t.time() - 93600) * 1000) < 60_000
    assert agg_engine.query(
        "SELECT TEXTCONTAINS('abc def', 'abc') AS x"
    ).collect()[0]["x"] is True
    assert agg_engine.query(
        "SELECT REGEXPEXTRACT('a1b2', '([0-9])') AS x"
    ).collect()[0]["x"] == "1"
    assert agg_engine.query(
        "SELECT ARRAYCONCATINT(array(1,2), array(3)) AS x"
    ).collect()[0]["x"] == [1, 2, 3]
    assert agg_engine.query(
        "SELECT TOJSONMAPSTR(map('a','1')) AS x"
    ).collect()[0]["x"] == '{"a":"1"}'
    assert agg_engine.query(
        "SELECT DISTINCTCOUNTRAWHLL(u) AS x FROM aggsrc"
    ).collect()[0]["x"] == 7


def test_round6_review_fixes():
    """Pins for the round-6 review findings on the rewriter."""
    from real_time_analytics_with_apache_pinot_on_aws_spark.engine import Engine

    # backslash-escaped quote inside a literal: content never rewrites
    src = r"SELECT 'it\'s DISTINCTCOUNT(x) here' AS s"
    assert R(src) == src
    # Spark's 3-arg frequency-weighted percentile passes through untouched
    assert (
        R("SELECT percentile(v, 0.5, w) FROM t")
        == "SELECT percentile(v, 0.5, w) FROM t"
    )
    # zero-arg calls are loud, not silently rewritten to 'count(DISTINCT )'
    with pytest.raises(ValueError, match="0 argument"):
        R("SELECT DISTINCTCOUNT() FROM t")
    # JSON_MATCH paths containing ' and '/'_and_' parse (AND split is
    # double-quote aware)
    assert Engine._parse_json_match_expr('"$.click_and_view" = 1') == [
        ("$.click_and_view", "=", "1")
    ]
    # numGroupsLimit only fires on a TOP-LEVEL group-by
    assert Engine._has_top_level_group_by("SELECT g FROM t GROUP BY g")
    assert not Engine._has_top_level_group_by(
        "SELECT * FROM (SELECT g FROM t GROUP BY g) x"
    )


def test_ago_signs_and_loud_errors(agg_engine):
    """AGO mirrors java.time.Duration.parse: per-component and
    whole-duration negation both work, and anything Duration.parse rejects
    (months, empty durations, garbage) raises instead of silently
    returning now-0 (round-6 review)."""
    import time as _t

    for iso in ("PT-6H", "-PT6H"):
        r = agg_engine.query(f"SELECT AGO('{iso}') AS x").collect()[0]["x"]
        assert abs(r - (_t.time() + 21600) * 1000) < 60_000, iso
    for bad in ("P1M", "PT", "garbage"):
        with pytest.raises(Exception):
            agg_engine.query(f"SELECT AGO('{bad}') AS x").collect()


def test_regexpextract_two_arg_returns_whole_match(agg_engine):
    assert agg_engine.query(
        "SELECT REGEXPEXTRACT('xabc42y', 'abc[0-9]+') AS x"
    ).collect()[0]["x"] == "abc42"
    assert agg_engine.query(
        "SELECT REGEXPEXTRACTGROUP('a1b2', '([a-z])([0-9])', 2) AS x"
    ).collect()[0]["x"] == "1"


def test_funnel_sql_spellings_match_funnel_state(spark, agg_engine):
    """FUNNELMAXSTEP / FUNNELMATCHSTEP / FUNNELCOMPLETECOUNT **[P1.2]** as
    SQL text: the emitted single-aggregate fold reproduces
    operators/funnel.funnel_state exactly — ordered-step advancement,
    strictly-after ordering, and the windowSize bound on every step after
    the first."""
    from real_time_analytics_with_apache_pinot_on_aws_spark.operators import funnel as FN

    rows = [
        (1, "2024-06-01 10:00:00", "view"),
        (1, "2024-06-01 10:05:00", "click"),
        (1, "2024-06-01 10:10:00", "buy"),
        (2, "2024-06-01 10:00:00", "view"),
        (2, "2024-06-01 09:00:00", "click"),   # click BEFORE view
        (3, "2024-06-01 10:00:00", "click"),   # never step 1
        (4, "2024-06-01 10:00:00", "view"),
        (4, "2024-06-03 10:00:00", "click"),   # outside the 1-day window
        (5, "2024-06-01 10:00:00", "view"),
        (5, "2024-06-01 10:00:00", "click"),   # same ts: NOT strictly after
    ]
    df = spark.createDataFrame(rows, "u int, ts string, ev string").selectExpr(
        "u", "cast(ts as timestamp) AS ts", "ev"
    )
    df.createOrReplaceTempView("fev")
    steps = ["view", "click", "buy"]
    want = {
        r["u"]: r["max_step"]
        for r in FN.funnel_state(df, "u", "ts", "ev", steps, within="1 DAY").collect()
    }
    got = {
        r["u"]: r["ms"]
        for r in agg_engine.query(
            "SELECT u, FUNNELMAXSTEP(ts, '86400000', 3, "
            "'ev = ''view''', 'ev = ''click''', 'ev = ''buy''') AS ms "
            "FROM fev GROUP BY u"
        ).collect()
    }
    # funnel_state only emits users with at least one matching event; the
    # SQL group-by sees the same groups here by construction
    assert got == want
    m = {
        r["u"]: (r["m"], r["c"])
        for r in agg_engine.query(
            "SELECT u, FUNNELMATCHSTEP(ts, '0', 2, 'ev = ''view''', "
            "'ev = ''click''') AS m, FUNNELCOMPLETECOUNT(ts, '0', 2, "
            "'ev = ''view''', 'ev = ''click''') AS c FROM fev GROUP BY u"
        ).collect()
    }
    assert m[1] == ([1, 1], 1)
    assert m[2] == ([1, 0], 0)          # order matters
    assert m[3] == ([0, 0], 0)
    assert m[4] == ([1, 1], 1)          # windowMs '0' disables the bound
    assert m[5] == ([1, 0], 0)          # same-ts is not strictly after
    # arity / literal validation is loud
    with pytest.raises(ValueError, match="numberSteps"):
        R("SELECT FUNNELMAXSTEP(ts, '0', 3, 'a=1') FROM t")
    with pytest.raises(ValueError, match="literal"):
        R("SELECT FUNNELMAXSTEP(ts, w, 1, 'a=1') FROM t")
    # trailing MODE literals parse: STRICT_INCREASE accepted, unknown loud
    assert "aggregate" in R(
        "SELECT FUNNELMAXSTEP(ts, '0', 1, 'a=1', 'STRICT_INCREASE') FROM t"
    )
    with pytest.raises(ValueError, match="unsupported mode"):
        R("SELECT FUNNELMAXSTEP(ts, '0', 1, 'a=1', 'STRICT_ORDER') FROM t")


def test_funnel_complete_count_counts_every_completion(spark, agg_engine):
    """FUNNELCOMPLETECOUNT resets the funnel state after each completion
    (round-6 review): a group completing the funnel twice counts 2, not 1;
    non-matching events fold to dropped NULLs (bounded per-group memory)."""
    rows = [
        ("2024-06-01 10:00:00", "view", 1),
        ("2024-06-01 10:01:00", "click", 1),
        ("2024-06-01 11:00:00", "view", 1),
        ("2024-06-01 11:01:00", "click", 1),
        ("2024-06-01 10:00:00", "view", 2),
        ("2024-06-01 10:05:00", "click", 2),
        ("2024-06-01 10:00:00", "view", 3),
        ("2024-06-01 10:00:00", "other", 4),
    ]
    spark.createDataFrame(rows, "ts string, ev string, u int").selectExpr(
        "u", "cast(ts as timestamp) AS ts", "ev"
    ).createOrReplaceTempView("fev2")
    view_step = "'ev = ''view'''"
    click_step = "'ev = ''click'''"
    got = {
        r["u"]: r["c"]
        for r in agg_engine.query(
            "SELECT u, FUNNELCOMPLETECOUNT(ts, '0', 2, "
            + view_step + ", " + click_step + ") AS c FROM fev2 GROUP BY u"
        ).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0, 4: 0}
