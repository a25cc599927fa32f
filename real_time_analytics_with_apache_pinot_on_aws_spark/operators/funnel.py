"""Funnel aggregation family (Pinot 1.2 ``FUNNEL*`` aggs **[P1.2]**).

``c8_funnel_counts`` (queries.py) covers ``FUNNELCOUNT``'s per-stage counts;
this module generalizes the same single-shuffle fold so the rest of the
family — ``FUNNELMAXSTEP``, ``FUNNELMATCHSTEP``, ``FUNNELCOMPLETECOUNT`` and
the ``maxStepDuration`` windowed mode — all derive from one per-user state
pass:

    events -> filter to funnel step types        (pushed to the scan)
           -> group by user, sort (ts, type)     ONE user-keyed shuffle
           -> fold through an N-slot timestamp state (first qualifying
              event per step, strictly event-time ordered)

Per-user state is bounded by events-per-user (the sessionizer's bound);
nothing downstream of the fold is larger than |users| rows.  The fold is a
codegen'd higher-order ``aggregate`` — no Python in the hot path.

Semantics match Pinot's strict-order funnel: step i+1 counts only from an
event STRICTLY after the event that satisfied step i; with ``within`` set,
every later step must also land inside ``t1 + within`` (maxStepDuration).
Both are exactly reproducible as a min-after CTE chain, which is what the
DuckDB oracles replay.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_state(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: str | None = None,
    strict: bool = True,
    mode: str | None = None,
) -> DataFrame:
    """Per-user funnel state: ``(user, t1..tN, max_step)``.

    ``tI`` is the timestamp of the first event completing step I (null if the
    user never reached it); ``max_step`` counts completed steps.  ``within``
    is an SQL interval string (e.g. ``'3 DAYS'``) bounding every step after
    the first to ``t1 + within`` — Pinot's ``maxStepDuration``.

    ``mode`` makes the twin contract with the SQL surface explicit
    (round 10, r9 ADVICE): pass the statement's literal —
    ``'STRICT_INCREASE'`` (strictly-after advancement ``>``) or
    ``'KEEP_ALL'`` (at-or-after ``>=``, Pinot's DEFAULT funnel mode
    **[P1.2]**) — and the state matches what the FUNNEL* statement
    routes compute for that mode.  A caller building the twin of a
    default-mode statement should pass ``mode='KEEP_ALL'``.

    ``strict`` is the boolean spelling of the same choice (``True`` ==
    ``'STRICT_INCREASE'``); it keeps its round-9 default for existing
    callers and is ignored when ``mode`` is given.
    """
    if mode is not None:
        if mode not in ("STRICT_INCREASE", "KEEP_ALL"):
            raise ValueError(
                f"unsupported funnel mode {mode!r} (supported: "
                "STRICT_INCREASE, KEEP_ALL)"
            )
        strict = mode == "STRICT_INCREASE"
    n = len(steps)
    evs = df.filter(F.col(type_col).isin(*steps)).select(user_col, ts_col, type_col)
    seq = evs.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct(ts_col, type_col))).alias("_seq")
    )
    null_ts = F.lit(None).cast("timestamp")
    state0 = F.struct(*[null_ts.alias(f"t{i + 1}") for i in range(n)])

    def advance(s: Column, e: Column) -> Column:
        fields = []
        for i, step_type in enumerate(steps):
            cur = s[f"t{i + 1}"]
            cond = cur.isNull() & (e[type_col] == step_type)
            if i > 0:
                prev = s[f"t{i}"]
                after = e[ts_col] > prev if strict else e[ts_col] >= prev
                cond = cond & prev.isNotNull() & after
                if within is not None:
                    cond = cond & (e[ts_col] <= s["t1"] + F.expr(f"INTERVAL {within}"))
            fields.append(F.when(cond, e[ts_col]).otherwise(cur).alias(f"t{i + 1}"))
        return F.struct(*fields)

    folded = seq.select(user_col, F.aggregate("_seq", state0, advance).alias("_st"))
    max_step = sum(
        (F.col(f"_st.t{i + 1}").isNotNull().cast("int") for i in range(n)),
        F.lit(0),
    )
    return folded.select(
        user_col,
        *[F.col(f"_st.t{i + 1}").alias(f"t{i + 1}") for i in range(n)],
        max_step.alias("max_step"),
    )


def funnel_step_counts(state: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Aggregate the per-user state into the dashboard funnel:

    one row per step with ``users_reached`` (FUNNELMATCHSTEP count),
    ``users_stopped_here`` (max_step == step) and ``complete_users``
    (FUNNELCOMPLETECOUNT, identical in every row by construction).  The
    input is |users| rows, so this is a tiny aggregate + a broadcast of the
    N-row step spine.
    """
    n = len(steps)
    dist = state.groupBy("max_step").agg(F.count(F.lit(1)).alias("n_users"))
    spine = state.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    return (
        F.broadcast(spine)
        .join(dist)  # n x (n+1) rows — the distribution, not the users
        .groupBy("step", "step_name")
        .agg(
            F.sum(F.when(F.col("max_step") >= F.col("step"), F.col("n_users")).otherwise(0))
            .cast("bigint")
            .alias("users_reached"),
            F.sum(F.when(F.col("max_step") == F.col("step"), F.col("n_users")).otherwise(0))
            .cast("bigint")
            .alias("users_stopped_here"),
            F.sum(F.when(F.col("max_step") >= n, F.col("n_users")).otherwise(0))
            .cast("bigint")
            .alias("complete_users"),
        )
        .orderBy("step")
    )


def funnel_step_duration_stats(
    state: DataFrame,
    n_steps: int,
    functions: Sequence[str] = ("min", "max", "avg", "median"),
) -> DataFrame:
    """Per-user step-duration statistics over a :func:`funnel_state`
    frame — the operator-level twin of the SQL surface's
    ``FUNNELSTEPDURATIONSTATS`` (Pinot 1.2 **[P1.2]**; the wire form is
    served by aggsql's window-cascade statement route, round 9).

    Adds one DOUBLE column per requested function (``dur_min`` /
    ``dur_max`` / ``dur_avg`` / ``dur_median``), each computed over the
    user's consecutive-step durations ``t_{i+1} - t_i`` in MILLISECONDS.
    The greedy state matches steps as a prefix, so a user at
    ``max_step = k`` contributes exactly ``k - 1`` durations; a user
    below step 2 gets NULLs.  Pure column arithmetic over the |users|-row
    state frame — no shuffle, no collections; median of an even count is
    the mean of the two middle values (the route's documented choice).

    Twin-contract notes (round-9 review): match the SQL statement's mode
    by building the state with the same ``strict`` flag
    (``'STRICT_INCREASE'`` -> ``strict=True``; Pinot's default /
    ``'KEEP_ALL'`` -> ``strict=False``).  Degenerate inputs the SQL twin
    rejects loudly are rejected here too (empty ``functions``,
    ``n_steps < 1``); duplicated function names — which the SQL array
    shape CAN represent — cannot be two identically-named columns, so
    they are a loud error instead of a silent collapse.
    """
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    if not functions:
        raise ValueError(
            "functions must name at least one duration statistic "
            "(min, max, avg, median)"
        )
    lowered = [f.lower() for f in functions]
    if len(set(lowered)) != len(lowered):
        raise ValueError(
            f"duplicate duration functions {list(functions)}: the "
            "named-column surface cannot carry two identical stats — "
            "request each once (the SQL spelling's array shape is the "
            "form that can repeat entries)"
        )
    allowed = {"min", "max", "avg", "median"}
    bad = [f for f in functions if f.lower() not in allowed]
    if bad:
        raise ValueError(
            f"unsupported duration functions {bad}; supported: "
            "min, max, avg, median"
        )
    ds = [
        F.when(
            F.col(f"t{i + 2}").isNotNull(),
            (
                F.unix_millis(F.col(f"t{i + 2}"))
                - F.unix_millis(F.col(f"t{i + 1}"))
            ).cast("double"),
        )
        for i in range(n_steps - 1)
    ]
    durs = (
        F.filter(F.array(*ds), lambda x: x.isNotNull())
        if ds
        else F.array().cast("array<double>")
    )
    out = state.withColumn("_durs", durs)
    sorted_durs = F.array_sort(F.col("_durs"))
    c = F.size(F.col("_durs"))
    exprs = {
        "min": F.array_min(F.col("_durs")),
        "max": F.array_max(F.col("_durs")),
        "avg": F.when(
            c > 0,
            F.aggregate(
                F.col("_durs"), F.lit(0.0), lambda a, x: a + x
            )
            / c,
        ),
        "median": F.when(c == 0, F.lit(None).cast("double"))
        .when(
            c % 2 == 1,
            F.element_at(sorted_durs, ((c + 1) / 2).cast("int")),
        )
        .otherwise(
            (
                F.element_at(sorted_durs, (c / 2).cast("int"))
                + F.element_at(sorted_durs, (c / 2).cast("int") + 1)
            )
            / 2.0
        ),
    }
    for f in functions:
        out = out.withColumn(f"dur_{f.lower()}", exprs[f.lower()])
    return out.drop("_durs")
