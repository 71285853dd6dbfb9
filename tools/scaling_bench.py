"""Two-cluster-size scaling protocol (sandbox stand-in for N vs 4N executors).

Runs bench.py twice over the IDENTICAL seeded input — local[8] then local[32] —
and reports indexing throughput at both parallelism levels plus scaling
efficiency = tput_4N / (4 * tput_N), per the BASELINE.json north rule (>= 0.8).

Usage: python tools/scaling_bench.py [n_turns] [--update-md]
Writes BENCH/BASELINE.md when --update-md is given.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_turns: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_TURNS=str(n_turns),
               SPARK_GRAFT_CORPUS_PATH=os.path.join(
                   REPO, ".scratch", f"bench-corpus-{n_turns}"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_turns = int(args[0]) if args else int(
        os.environ.get("SPARK_GRAFT_BENCH_TURNS", "100000"))
    update_md = "--update-md" in sys.argv

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    results = {}
    for cpus in (8, 32):
        best = None
        for rep in range(reps):  # best-of-N: damps interference from host load
            t0 = time.time()
            r = run_level(cpus, n_turns)
            print(f"local[{cpus}] rep{rep}: build {r['index_build']['secs']}s "
                  f"({r['index_build']['turns_per_sec']} turns/s), "
                  f"e2e {r['value']}s  [{time.time()-t0:.0f}s wall]",
                  file=sys.stderr)
            if best is None or r["index_build"]["secs"] < best["index_build"]["secs"]:
                best = r
        results[cpus] = best

    tput8 = results[8]["index_build"]["turns_per_sec"]
    tput32 = results[32]["index_build"]["turns_per_sec"]
    eff = tput32 / (4 * tput8)
    summary = {
        "n_turns": n_turns,
        "tput_local8": tput8,
        "tput_local32": tput32,
        "scaling_efficiency": round(eff, 3),
        "bench_local8": results[8],
        "bench_local32": results[32],
    }
    print(json.dumps(summary))

    if update_md:
        md = f"""# BENCH/BASELINE — two-parallelism scaling protocol

North-rule criterion: indexing-throughput scaling efficiency >= 0.8 between
cluster sizes N and 4N. The sandbox has no multi-node cluster, so per the driver
protocol the SAME seeded input ({n_turns:,} synthetic transcript turns,
seed=42) is indexed at two parallelism levels on one machine:

| level | build secs | throughput (turns/sec) |
|---|---|---|
| `local[8]`  (N)  | {results[8]['index_build']['secs']} | {tput8} |
| `local[32]` (4N) | {results[32]['index_build']['secs']} | {tput32} |

**Scaling efficiency = tput_4N / (4 x tput_N) = {eff:.3f}**

Per-query seconds at each level (BM25 WAND top-k + operator headliners, sf0.1):

```json
{json.dumps(results[8]['queries'], indent=2)}
```

```json
{json.dumps(results[32]['queries'], indent=2)}
```

Protocol notes
- Input is materialized to parquet first; generation is excluded from the
  timed build. Same bytes at both levels.
- Build = analyzer (Arrow pandas UDF) -> deterministic docids -> posting
  encode (numpy kernels in mapInPandas) -> term dictionary + stats, with
  manifests. `spark.sql.shuffle.partitions = 2*cpus`, AQE + skew join on.
- Reproduce: `python tools/scaling_bench.py {n_turns} --update-md`
"""
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md)


if __name__ == "__main__":
    main()
