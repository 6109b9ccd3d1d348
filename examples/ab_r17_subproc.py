"""Interleaved two-tree A/B: alternate subprocesses between the pristine
HEAD worktree (/tmp/repo_before) and the working tree, timing the same
queries with the noop sink (guide §1.4) — both arms ride the same host
drift because rounds interleave (the r16 discipline).

Usage: python examples/ab_r17_subproc.py <rounds> <query> [query ...]

Child mode (internal): ab_r17_subproc.py --child <tree> <sf_dir> <query...>
prints one JSON line {query: median_sec} over 3 fresh plans after 1 warmup.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

AFTER = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEFORE = "/tmp/repo_before"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(tree: str, sf_dir: str, names: list[str]) -> None:
    sys.path.insert(0, tree)
    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("ab-r17")
    spark.sparkContext.setLogLevel("ERROR")
    import time

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # queries that run jobs EAGERLY during plan construction (the
    # semi-naive loop checkpoints each level) must be timed around the
    # whole build+noop, like bench.py's eager keys
    eager_names = {"recursive_reachability_semi_naive"}
    out = {}
    for name in names:
        noop(QUERIES[name](spark, sf_dir))  # warm-up plan
        runs = []
        for _ in range(3):
            if name in eager_names:
                t0 = time.perf_counter()
                noop(QUERIES[name](spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            else:
                df = QUERIES[name](spark, sf_dir)  # fresh plan each run
                t0 = time.perf_counter()
                noop(df)
                runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 4)
    print("ABRESULT " + json.dumps(out))


def run_arm(tree: str, names: list[str]) -> dict[str, float]:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", tree, SF,
         *names],
        capture_output=True, text=True, timeout=1800, cwd=tree)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no result from {tree}: {p.stdout[-500:]!r} "
                       f"{p.stderr[-500:]!r}")


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4:])
        return
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    acc: dict[str, dict[str, list[float]]] = {
        n: {"before": [], "after": []} for n in names}
    for r in range(rounds):
        for arm, tree in (("before", BEFORE), ("after", AFTER)):
            got = run_arm(tree, names)
            for n, v in got.items():
                acc[n][arm].append(v)
            print(f"round {r + 1} {arm}: {got}", flush=True)
    print("\n=== medians over rounds ===")
    for n in names:
        b = statistics.median(acc[n]["before"])
        a = statistics.median(acc[n]["after"])
        print(f"{n}: before {b:.3f}s  after {a:.3f}s  "
              f"speedup {b / a if a > 0 else float('inf'):.2f}x")
    print(json.dumps(acc))


if __name__ == "__main__":
    main()
