"""CLP log-message encoding + CLPDECODE (SURVEY B68).

Pinot 1.2 ships CLP (Compressed Log Processing) support for log-message
columns **[P1.2]**: the ``CLPLogRecordExtractor`` stream decoder
(``pinot-clp-log`` input-format plugin, configured per field via
``fieldsForClpEncoding``) splits a log-message field into THREE physical
columns — ``<f>_logtype``, ``<f>_dictionaryVars``, ``<f>_encodedVars`` —
and the ``CLPDECODE`` scalar transform reassembles the original message
at query time.  The scheme is the CLP paper's (Rodrigues et al., "CLP:
Efficient and Scalable Search on Compressed Text Logs", OSDI'21): the
*logtype* is the message template with variables replaced by placeholder
bytes, dictionary variables (tokens mixing digits with other characters,
e.g. ``task_12``/``Clerk#000000951``) are stored as strings, and numeric
variables are stored as machine integers.

Why it matters at 100 TB: logtype cardinality is bounded by the number of
distinct log TEMPLATES (thousands), not log lines (trillions), so the
logtype column dictionary/RLE-encodes to near-zero in parquet;
encodedVars are bit-packed longs; only dictionaryVars carry real entropy.
That is the paper's compression argument, and it composes with analytics:
template mining is a ``GROUP BY logtype`` and numeric aggregation runs
directly over ``encodedVars`` without decoding a single message.

Spark mapping — everything here is built-in higher-order functions
(transform/filter/aggregate), codegen'd JVM-side, zero Python in the hot
path:

- :func:`clp_encode` — one map-side projection; no shuffle.
- :func:`clp_decode` — one ``aggregate`` walk over the logtype segments;
  no shuffle, no UDF.

Documented divergences from Pinot's encoder:

- Float variables stay dictionary-side.  CLP encodes a representable
  subset of floats into longs and dictionary-stores the rest; routing
  ALL non-integer variables to the dictionary makes this analog
  unconditionally lossless (``decode(encode(x)) == x`` for every string)
  at the cost of dictionary entries for float tokens.
- Integer variables are encoded only when the text round-trips exactly
  through BIGINT (``cast(cast(t as long) as string) == t``), so
  ``007`` / ``-0`` / 20-digit ids stay dictionary-side instead of being
  corrupted.
- Tokenization is single-space splitting (lossless under
  ``array_join(split(s, ' '), ' ')`` for every input, including runs of
  spaces); CLP's delimiter set is configurable and defaults wider.

Reference deployment context: the reference ingests JSON click events
(resources/pinot/resources/kinesisTableConfigFile.json:21) on Pinot
1.2.0 (resources/pinot/userData/userdata-pinotserver.sh:5), where this
plugin is available but not configured — the row is engine-surface
parity, same class as B66/B67.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: CLP placeholder bytes (paper §4.1 / pinot-clp-common): dictionary
#: variable and integer variable.  A token CONTAINING a placeholder byte
#: is forced dictionary-side wholesale, so decode's placeholder scan over
#: the logtype can never be confused by message content.
DICT_VAR = "\x11"
INT_VAR = "\x12"

_SUBSTR_END = 2147483647


def clp_column_names(column: str) -> tuple[str, str, str]:
    """Pinot's physical column names for a CLP-encoded field **[P1.2]**:
    ``<f>_logtype``, ``<f>_dictionaryVars``, ``<f>_encodedVars``.  (Pinot
    requires them declared in the schema; the analog derives them.)"""
    return (
        f"{column}_logtype",
        f"{column}_dictionaryVars",
        f"{column}_encodedVars",
    )


def _is_int_var(t: Column) -> Column:
    # Encoded (integer) variable: pure optionally-signed digits that
    # round-trip exactly through BIGINT — leading zeros, "-0", and
    # out-of-range magnitudes fail the round-trip and go dictionary-side.
    # coalesce: try_cast returns NULL on overflow ("92233720368547758080"),
    # which must classify as FALSE, not NULL — a NULL here would drop the
    # token from the dictionary filter while the logtype still writes its
    # placeholder, misaligning every later variable in the row.
    return F.coalesce(
        t.rlike("^-?[0-9]{1,19}$") & (t.try_cast("long").cast("string") == t),
        F.lit(False),
    )


def _is_var(t: Column) -> Column:
    # CLP's variable heuristic: the token contains a digit.  Placeholder
    # bytes force dictionary-side (see DICT_VAR note above).
    return t.rlike("[0-9]") | t.contains(DICT_VAR) | t.contains(INT_VAR)


def clp_encode(df: DataFrame, column: str, drop: bool = True) -> DataFrame:
    """Replace ``column`` with its three CLP physical columns.

    One map-side projection (split/transform/filter/array_join — all
    codegen): no shuffle, no UDF, order-preserving within the row so
    decode's left-to-right placeholder walk realigns variables exactly.
    A NULL message yields three NULLs (and decodes back to NULL).
    """
    lt_col, dv_col, ev_col = clp_column_names(column)
    # Round 11: the token array is projected once and the three physical
    # columns reference it — inline, each output column re-split the
    # message, i.e. three splits per row.
    toked = df.select("*", F.split(F.col(column), " ", -1).alias("__clp_toks"))
    tokens = F.col("__clp_toks")
    out = toked.select(
        "*",
        F.array_join(
            F.transform(
                tokens,
                lambda t: F.when(_is_int_var(t), F.lit(INT_VAR))
                .when(_is_var(t), F.lit(DICT_VAR))
                .otherwise(t),
            ),
            " ",
        ).alias(lt_col),
        F.filter(tokens, lambda t: _is_var(t) & ~_is_int_var(t)).alias(dv_col),
        F.transform(
            F.filter(tokens, _is_int_var), lambda t: t.try_cast("long")
        ).alias(ev_col),
    ).drop("__clp_toks")
    return out.drop(column) if drop else out


def clp_decode(logtype: Column, dict_vars: Column, encoded_vars: Column) -> Column:
    """Reassemble the original message — Pinot's ``CLPDECODE`` transform
    **[P1.2]** (3-argument form).

    The logtype is split into segments at each placeholder byte
    (zero-width lookahead, so the placeholder stays at the head of its
    segment), then a single ``aggregate`` walk substitutes the next
    dictionary/encoded variable per placeholder while carrying both
    cursors in a struct accumulator.  Pure codegen — no shuffle, no UDF,
    no Python.
    """
    segments = F.split(logtype, f"(?=[{DICT_VAR}{INT_VAR}])", -1)
    init = F.struct(
        F.lit("").alias("acc"), F.lit(0).alias("di"), F.lit(0).alias("ei")
    )

    def step(s: Column, seg: Column) -> Column:
        return (
            F.when(
                seg.startswith(DICT_VAR),
                F.struct(
                    F.concat(
                        s["acc"],
                        dict_vars[s["di"]],
                        F.substring(seg, 2, _SUBSTR_END),
                    ).alias("acc"),
                    (s["di"] + 1).alias("di"),
                    s["ei"].alias("ei"),
                ),
            )
            .when(
                seg.startswith(INT_VAR),
                F.struct(
                    F.concat(
                        s["acc"],
                        encoded_vars[s["ei"]].cast("string"),
                        F.substring(seg, 2, _SUBSTR_END),
                    ).alias("acc"),
                    s["di"].alias("di"),
                    (s["ei"] + 1).alias("ei"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(s["acc"], seg).alias("acc"),
                    s["di"].alias("di"),
                    s["ei"].alias("ei"),
                )
            )
        )

    return F.aggregate(segments, init, step, lambda s: s["acc"])


def clp_decode_column(df_or_prefix, column: str | None = None) -> Column:
    """Sugar matching Pinot's 1-argument ``CLPDECODE(field)`` **[P1.2]**:
    decode from the three derived columns of ``column`` (or of the single
    string argument when called with one arg)."""
    col = column if column is not None else df_or_prefix
    lt, dv, ev = clp_column_names(col)
    return clp_decode(F.col(lt), F.col(dv), F.col(ev))


#: SQL body for the CLPDECODE temporary-function macro (functions/sqlfns.py
#: registers it) — the same aggregate walk in SQL text, so the Pinot
#: spelling works in plain ``spark.sql`` statements.  The placeholder
#: bytes are embedded literally in the string literals.
CLPDECODE_SQL_BODY = (
    f"aggregate(split(lt, '(?=[{DICT_VAR}{INT_VAR}])', -1), "
    "struct('' as acc, 0 as di, 0 as ei), "
    "(s, seg) -> CASE "
    f"WHEN startswith(seg, '{DICT_VAR}') THEN "
    "struct(concat(s.acc, dv[s.di], substring(seg, 2)) as acc, "
    "s.di + 1 as di, s.ei as ei) "
    f"WHEN startswith(seg, '{INT_VAR}') THEN "
    "struct(concat(s.acc, cast(ev[s.ei] as string), substring(seg, 2)) as acc, "
    "s.di as di, s.ei + 1 as ei) "
    "ELSE struct(concat(s.acc, seg) as acc, s.di as di, s.ei as ei) END, "
    "s -> s.acc)"
)
