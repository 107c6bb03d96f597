#!/usr/bin/env python
"""Physical-plan hygiene sweep over driver queries.

For each audited query, builds the DataFrame at sf0.001 (plan shape only
— nothing is executed) and reports the markers that matter at 100 TB:

- ``python``: any Python/Arrow eval in the plan (row-at-a-time poison —
  the repo's contract is zero outside the explicit Arrow kernels);
- ``smj`` / ``bhj``: SortMergeJoin vs BroadcastHashJoin counts;
- ``exch``: shuffle Exchange count (the stage-boundary budget);
- ``pushed``: whether any PushedFilters reached a scan;
- ``codegen``: WholeStageCodegen span count.

Usage: python scripts/plan_audit.py [name ...]   (default: all queries)
       python scripts/plan_audit.py --markdown > PLANS.md
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    lines = plan.splitlines()
    return {
        "python": sum(
            1 for ln in lines if "Python" in ln or "ArrowEval" in ln
        ),
        "smj": sum(1 for ln in lines if "SortMergeJoin" in ln),
        "bhj": sum(1 for ln in lines if "BroadcastHashJoin" in ln),
        "exch": sum(1 for ln in lines if ") Exchange" in ln),
        "pushed": any(
            "PushedFilters" in ln and "[]" not in ln.split("PushedFilters")[-1][:4]
            for ln in lines
        ),
        "codegen": sum(1 for ln in lines if "WholeStageCodegen" in ln),
    }


def main() -> int:
    import __spark_entry__ as entrymod
    from tric_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    markdown = "--markdown" in sys.argv
    spark = get_spark(app_name="plan-audit", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    names = args or sorted(qs)
    rows = []
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            a = audit(plan_of(df))
            rows.append((name, a, ""))
        except Exception as e:  # noqa: BLE001
            rows.append((name, None, str(e).splitlines()[0][:80]))
    if markdown:
        print("| query | python evals | SMJ | BHJ | exchanges | pushed filters | codegen spans |")
        print("|---|---|---|---|---|---|---|")
        for name, a, err in rows:
            if a is None:
                print(f"| {name} | plan-build error: {err} | | | | | |")
            else:
                print(
                    f"| {name} | {a['python']} | {a['smj']} | {a['bhj']} |"
                    f" {a['exch']} | {'yes' if a['pushed'] else '—'} |"
                    f" {a['codegen']} |"
                )
    else:
        for name, a, err in rows:
            print(name, a if a else f"ERR {err}")
    n_py = sum(1 for _, a, _ in rows if a and a["python"])
    print(
        f"\n{len(rows)} plans audited; {n_py} contain Python/Arrow eval "
        "(expected: only the explicit Arrow kernels)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
