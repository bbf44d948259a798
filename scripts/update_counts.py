#!/usr/bin/env python
"""Regenerate the README's query/test counts from the actual sources so
they stop drifting (they were hand-edited — and wrong — twice).

Usage: python scripts/update_counts.py [--check]
  --check: exit 1 if the README is stale instead of rewriting it.
"""

from __future__ import annotations

import re
import subprocess
import sys

sys.path.insert(0, ".")


def collected_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "--no-header"],
        capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(r"(\d+) tests? collected", out)
    if m:
        return int(m.group(1))
    # newer pytest -q prints "path: N" per file instead of a summary line
    per_file = re.findall(r"^tests/\S+: (\d+)$", out, re.M)
    if not per_file:
        raise RuntimeError(f"cannot parse pytest collection output:\n{out}")
    return sum(int(n) for n in per_file)


def query_counts() -> tuple[int, int]:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    return len(qs), len(oracles)


def main() -> int:
    n_tests = collected_tests()
    n_queries, n_oracle = query_counts()
    path = "README.md"
    src = open(path, encoding="utf-8").read()
    out = re.sub(r"# \d+ tests \(incl\. hypothesis",
                 f"# {n_tests} tests (incl. hypothesis", src)
    out = re.sub(r"# the driver gate locally: \d+ queries",
                 f"# the driver gate locally: {n_queries} queries", out)
    out = re.sub(r"# \d+ oracle-checked",
                 f"# {n_oracle} oracle-checked", out)
    out = re.sub(r"entry / \d+ queries / DuckDB oracles",
                 f"entry / {n_queries} queries / DuckDB oracles", out)
    if "--check" in sys.argv:
        if out != src:
            print("README counts are stale; run scripts/update_counts.py")
            return 1
        print(f"README counts current: {n_tests} tests, {n_queries} queries, "
              f"{n_oracle} oracle-checked")
        return 0
    open(path, "w", encoding="utf-8").write(out)
    print(f"README updated: {n_tests} tests, {n_queries} queries, "
          f"{n_oracle} oracle-checked")
    return 0


if __name__ == "__main__":
    sys.exit(main())
