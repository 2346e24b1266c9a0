"""Hardware scaling-ceiling calibration for the sandbox host.

The two-parallelism protocol (BENCH/BASELINE.md) uses local[2] -> local[8]
as the N -> 4N executor stand-in. That stand-in is only faithful up to the
host's own core-scaling ceiling: all local "executors" share ONE socket's
memory channels, while real added cluster nodes bring their own. This
script measures that ceiling directly with Spark-free process burners at
three working-set sizes, so engine kernel efficiencies can be read against
the hardware envelope for their traffic class:

- L2-resident (256 KB/proc): pure-ALU ceiling (detects turbo-clock skew).
- mixed (16 MB/proc): cache+DRAM mix, the typical Spark task profile.
- DRAM-streaming (128 MB/proc): worst case; saturates the socket's bus.

Usage: python scripts/hw_calibration.py [--seconds 8]
Writes nothing; prints one JSON line per class (paste into BENCH docs).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _burn(q, n_elem: int, seconds: float) -> None:
    x = np.arange(n_elem, dtype=np.int64)
    t0 = time.time()
    iters = 0
    while time.time() - t0 < seconds:
        x = x * 6364136223846793005 + 1442695040888963407
        x ^= x >> 33
        iters += 1
    q.put(iters)


def measure(n_procs: int, n_elem: int, seconds: float) -> int:
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_burn, args=(q, n_elem, seconds)) for _ in range(n_procs)
    ]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    classes = [
        ("alu_l2_256kb", 32_768),
        ("mixed_16mb", 2_000_000),
        ("dram_128mb", 16_000_000),
    ]
    for label, n_elem in classes:
        t_lo = measure(lo, n_elem, args.seconds)
        t_hi = measure(hi, n_elem, args.seconds)
        eff = (t_hi / t_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "class": label,
                    "bytes_per_proc": n_elem * 8,
                    f"iters_x{lo}": t_lo,
                    f"iters_x{hi}": t_hi,
                    "hw_scaling_efficiency": round(eff, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
