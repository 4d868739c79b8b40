"""Hardware-ceiling calibration: NO Spark, no engine code.

Measures how this box itself scales a memory-bound text workload
(pandas regex + string ops over page-sized strings — the same
instruction mix as the extraction stage) from N to 4N OS processes.
The result is the ceiling any engine can reach here: on this
virtualized box, 8 → 32 busy cores yields well under 4× (steal /
frequency / memory-bandwidth contention), so engine scaling
efficiencies must be read against THIS number, not against a perfect
4.0 (BASELINE.md "Scaling-efficiency verdict").

Usage: python scripts/bench_cpuburn.py [n_tasks] [procs...]
       defaults: 256 tasks at 2, 8, 32 processes
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import pandas as pd

WORDS = ("python développeur backend data spark offre salaire société "
         "paris remote senior équipe test croissance").split()


def _page(i: int) -> str:
    body = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(1500))
    return f'<h1 class="title">Job {i}</h1><div class="description">{body}</div>'


def _task(seed: int) -> int:
    # one task ≈ one Arrow batch of extraction work: build ~100 pages,
    # regex-extract + whitespace-normalize, like extractors.py does
    pages = pd.Series([_page(seed * 100 + k) for k in range(100)])
    title = pages.str.extract(r'(?s)<h1 class="title">(.*?)</h1>', expand=False)
    desc = pages.str.split('<div class="description">', n=1, regex=False).str[1]
    desc = desc.str.split("</div>", n=1, regex=False).str[0]
    clean = desc.str.split().str.join(" ")
    return int(title.str.len().sum() + clean.str.len().sum())


def run_level(n_tasks: int, procs: int) -> dict:
    with mp.Pool(procs) as pool:
        pool.map(_task, range(8))  # warm the pool
        t0 = time.perf_counter()
        pool.map(_task, range(n_tasks), chunksize=max(1, n_tasks // (procs * 4)))
        wall = time.perf_counter() - t0
    return {"procs": procs, "wall_s": round(wall, 2),
            "tasks_per_sec": round(n_tasks / wall, 1)}


def main():
    n_tasks = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    procs = [int(p) for p in sys.argv[2:]] or [2, 8, 32]
    runs = [run_level(n_tasks, p) for p in procs]
    out = {"tasks": n_tasks, "runs": runs}
    for a, b in zip(runs, runs[1:]):
        key = f"ceiling_{a['procs']}to{b['procs']}"
        out[key] = round(
            (b["tasks_per_sec"] / a["tasks_per_sec"]) / (b["procs"] / a["procs"]), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
