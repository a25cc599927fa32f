"""Capture .explain("formatted") for the bench headline queries.

Usage:
    python tools/plan_capture.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix defaults to "before") for each
headline query (or the explicit list given).  Read-only: no query executes —
explain() is planning only, so this is safe to run alongside nothing else.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark import queries as Q  # noqa: E402
from real_time_analytics_with_apache_pinot_on_aws_spark.session import build_session  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("plans/r11")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(HEADLINE)
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="plan_capture")
    registry = Q.all_queries()
    for name in names:
        if name not in registry:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = registry[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {out_dir}/{name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
