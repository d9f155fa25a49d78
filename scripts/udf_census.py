"""Registry-wide Python-UDF-pass census.

For every registered batch query, counts the Python evaluation
operators (ArrowEvalPython / BatchEvalPython / MapInPandas /
FlatMapGroupsInPandas / FlatMapCoGroupsInPandas) in the STATIC
physical plan; any query with >= 2 static occurrences is re-counted
in the FINAL adaptive plan (static text overstates duplicates —
AQE's ReuseExchange collapses identical subtrees at runtime, see
plans/audit.final_adaptive_plan).  A final count above the number of
semantically distinct UDF passes means a corpus-sized kernel runs
more than once per query — the round-7 tokenize-once finding class.

Run from the repo root: ``python scripts/udf_census.py [name ...]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def main() -> None:
    from inverted_index_using_the_map_reduce_paradigm_spark.plans import audit
    from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all
    from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark

    spark = get_spark("udf_census")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    only = set(sys.argv[1:])
    rows = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        q = qs[name]
        if "streaming" in q.tags:
            continue
        try:
            df = q.fn(spark, SF)
            static = audit.python_eval_count(audit.physical_plan(df))
            final = (
                audit.python_eval_count(audit.final_adaptive_plan(df))
                if static >= 2
                else static
            )
        except Exception as e:  # noqa: BLE001 — census must finish
            rows.append((name, -1, -1, f"ERROR {type(e).__name__}: {e}"))
            continue
        if static or final:
            rows.append((name, static, final, ""))
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    print(f"{'query':40s} {'static':>6s} {'final':>6s}")
    for name, static, final, err in rows:
        print(f"{name:40s} {static:6d} {final:6d}  {err}")
    multi = [r for r in rows if r[2] >= 2]
    print(f"\n{len(rows)} queries evaluate Python kernels; "
          f"{len(multi)} have >= 2 passes in the FINAL plan")


if __name__ == "__main__":
    main()
