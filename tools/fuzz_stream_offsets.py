"""Randomized model-checker for the orcx streaming source's offset
logic (jobs/datasource.OrcEngineStreamReader).

The reader's offsets are an mtime watermark ``{"t", "boundary"}``
rather than a seen-files map, and the hard cases are all about
same-mtime cohorts, rate-limit cuts inside a cohort, retention
deletes, and restarts — exactly the shape of the r4 starvation bug
(a capped boundary dropping previously-consumed ties re-served them
forever). This harness drives the REAL reader class through a
simulated Structured-Streaming microbatch loop (every latestOffset is
processed and committed before the next, restarts re-instantiate the
reader from the checkpointed offset with ``_served = None``) against
randomized publish timelines, and checks:

  1. exactly-once: no file is consumed twice, and after a full drain
     every published file that survived until consumption is consumed
     exactly once (no starvation);
  2. rate limit: every batch after an instance's first consumes at
     most ``max_files_per_trigger`` files (the first batch of an
     instance is a documented unbounded catch-up);
  3. retention: deleting already-consumed files never crashes the
     loop, rewinds the watermark, or re-serves anything.

Timelines exercise the adversarial cases deliberately: bursts of
files published in ONE mtime tick (coarse-mtime cohorts), publishes
landing at exactly the served watermark's t (ties arriving after the
cut), interleaved deletes of consumed files, and restarts mid-cohort.
Publish mtimes never go backwards — the module's own publish contract
(tmp + os.replace + fresh utime).

Usage:
    python tools/fuzz_stream_offsets.py --seeds 400 [--start 0]

One line per failure (seed + invariant + detail); exit 1 on any.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.orc_file import write_orc
from jobs.datasource import OrcEngineStreamReader


def _publish(d: str, name: str, mtime_ns: int) -> None:
    p = os.path.join(d, name)
    tmp = p + ".tmp"
    write_orc(pa.table({"x": pa.array([1], pa.int32())}), tmp)
    os.replace(tmp, p)
    os.utime(p, ns=(mtime_ns, mtime_ns))


def run_seed(seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    fails: list[str] = []
    max_files = int(rng.choice([0, 1, 2, 3]))
    options = {"max_files_per_trigger": str(max_files)}
    with tempfile.TemporaryDirectory() as d:
        reader = OrcEngineStreamReader(d, None, options)
        cur = reader.initialOffset()
        first_batch_of_instance = True

        clock = 1_000_000_000  # ns; publishes never go backwards
        published: list[str] = []     # files ever published
        deleted_unconsumed: set[str] = set()
        consumed: list[str] = []      # consumption log (with dups)
        counter = 0

        def batch() -> int:
            """One microbatch: latestOffset -> partitions -> commit.
            Returns number of files consumed."""
            nonlocal cur, first_batch_of_instance
            end = reader.latestOffset()
            parts = reader.partitions(cur, end)
            files = [os.path.basename(p.path) for p in parts if p.path]
            if max_files and not first_batch_of_instance \
                    and len(files) > max_files:
                fails.append(f"rate limit: batch consumed {len(files)} "
                             f"> {max_files}: {files}")
            consumed.extend(files)
            reader.commit(end)
            cur = end
            first_batch_of_instance = False
            return len(files)

        steps = int(rng.integers(5, 30))
        for _ in range(steps):
            act = rng.random()
            if act < 0.55:
                # publish a burst; ~40% of bursts land in ONE mtime
                # tick (cohort), and ~20% at exactly the current
                # watermark t (ties arriving after the cut)
                k = int(rng.integers(1, 5))
                cohort = rng.random() < 0.4
                if rng.random() < 0.2 and cur["t"] >= clock:
                    t0 = cur["t"]
                else:
                    clock += int(rng.integers(1, 3)) * 1000
                    t0 = clock
                for _ in range(k):
                    name = f"f{int(rng.integers(0, 10**6)):06d}-" \
                           f"{counter:04d}.orc"
                    counter += 1
                    _publish(d, name, t0)
                    published.append(name)
                    if not cohort:
                        clock += 1000
                        t0 = clock
                clock = max(clock, t0)
            elif act < 0.75:
                # microbatch(es)
                for _ in range(int(rng.integers(1, 3))):
                    batch()
            elif act < 0.85:
                # retention: delete some already-consumed files
                done_on_disk = [f for f in set(consumed)
                                if os.path.exists(os.path.join(d, f))]
                if done_on_disk:
                    for f in rng.choice(
                            done_on_disk,
                            size=int(rng.integers(1, len(done_on_disk) + 1)),
                            replace=False):
                        os.remove(os.path.join(d, str(f)))
            elif act < 0.88:
                # data loss: delete a published-but-unconsumed file (a
                # misconfigured retention). The reader must neither
                # crash nor wedge; the file just leaves the expected
                # set. (Mid-call races — delete between a snapshot and
                # its tail read — are out of model scope.)
                pending = [f for f in published
                           if f not in set(consumed)
                           and os.path.exists(os.path.join(d, f))]
                if pending:
                    f = str(rng.choice(pending))
                    os.remove(os.path.join(d, f))
                    deleted_unconsumed.add(f)
            else:
                # restart: new reader instance from the checkpoint
                reader = OrcEngineStreamReader(d, None, options)
                first_batch_of_instance = True

        # drain: run batches until two consecutive empty ones
        empty = 0
        for _ in range(200):
            if batch() == 0:
                empty += 1
                if empty >= 2:
                    break
            else:
                empty = 0
        else:
            fails.append("drain did not converge in 200 batches")

        dup = {f for f in consumed if consumed.count(f) > 1}
        if dup:
            fails.append(f"duplicates: {sorted(dup)[:5]}")
        expected = set(published) - deleted_unconsumed
        missing = expected - set(consumed)
        if missing:
            fails.append(f"starved (never consumed): "
                         f"{sorted(missing)[:5]} of {len(expected)}")
    return [f"seed={seed} mft={max_files} {m}" for m in fails]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=200)
    ap.add_argument("--start", type=int, default=0)
    args = ap.parse_args()
    n_fail = 0
    for s in range(args.start, args.start + args.seeds):
        for m in run_seed(s):
            print(m)
            n_fail += 1
    print(f"stream-offset fuzz: {args.seeds} seeds, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
