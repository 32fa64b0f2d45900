"""Dump formatted physical plans for the headline queries — the evidence
that filters push down, joins broadcast, and codegen spans stay wide.

    python tools/explain_plans.py [sf_dir] [name_substring]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    from bench import HEADLINE
    from opentsdb_spark import catalog
    from opentsdb_spark.session import get_spark

    spark = get_spark("explain-plans")
    fns = {"flagship": catalog.flagship}
    fns.update({n: qd.fn for n, qd in catalog.CATALOG.items()})
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    for name in HEADLINE:
        if only and only not in name:
            continue
        df = fns[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        tree = plan.split("\n\n")[0]
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        print(f"===== {name} =====")
        print(tree)
        for p in pushed:
            if p.strip():
                print(f"  PushedFilters: {p}")
        n_exch = tree.count("Exchange") - tree.count("BroadcastExchange")
        n_bc = tree.count("BroadcastExchange")
        print(f"  shuffles={n_exch} broadcasts={n_bc}")
        print()


if __name__ == "__main__":
    main()
