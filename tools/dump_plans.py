"""Dump .explain("formatted") for headline queries to plans/r10/.

Usage:
    python tools/dump_plans.py before [name ...]
    python tools/dump_plans.py after  [name ...]

With no names, dumps every bench HEADLINE query.  Plans are captured
from the same (spark, sf_dir) callables the bench times; AQE shows the
initial plan (isFinalPlan=false), which is what the plan-shape
arguments in OPTIMIZATION_r10.md reference (Exchange count, join
strategy, PushedFilters, BatchEvalPython nodes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from pgloader_spark.queries import QUERIES  # noqa: E402
from pgloader_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_SUBDIR", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        n_py = (
            txt.count("BatchEvalPython")
            + txt.count("ArrowEvalPython")
            + txt.count("MapInArrow")
            + txt.count("MapInPandas")
        )
        print(f"{name}: {len(txt.splitlines())} lines, Exchange={n_ex}, py={n_py}")
    spark.stop()


if __name__ == "__main__":
    main()
