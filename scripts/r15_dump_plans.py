"""Dump .explain('formatted') for named queries to plans/<tag>/.

Usage: python scripts/r15_dump_plans.py <repo_root> <out_dir> <suffix> <sf_dir> <name> [name ...]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    root, out_dir, suffix, sf_dir = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, root)

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark(f"r15-plans-{suffix}")
    regs = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = regs[name](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(p)
        print(f"wrote {name}_{suffix}.txt ({len(p)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
