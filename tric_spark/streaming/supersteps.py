"""Checkpointed, resumable superstep driver. [north-rule]

The reference's buffered variants keep explicit resume cursors
(``prev_m_/prev_k_``, EdgeStat.active_ — hbufastric.hpp:420–502) so a scan
can continue mid-stream. Spark tasks are restartable, so our resumability
lives at the coarser *superstep* granularity instead: after every k
supersteps the state DataFrame is written to parquet together with a meta
JSON (superstep number, row count, counters, lineage: parent checkpoint +
run config). A superstep checkpoint is COMMITTED only by the atomic rename
of its meta file — a killed run leaves either a complete checkpoint or
garbage that resume ignores (write-then-rename, SURVEY §7 hard-point (d)).

Resume = read the latest committed checkpoint and continue the loop from
there; the kill/resume test asserts bit-identical final state vs an
uninterrupted run.

Checkpointing to parquet (not RDD ``.checkpoint()``) survives across
applications — at production scale the parquet dir is an Iceberg table and
``lineage.parent`` is a snapshot id.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

META_NAME = "_META.json"


def _committed_steps(checkpoint_dir: str) -> list[int]:
    if not os.path.isdir(checkpoint_dir):
        return []
    steps = []
    for name in os.listdir(checkpoint_dir):
        meta = os.path.join(checkpoint_dir, name, META_NAME)
        if name.startswith("step_") and os.path.exists(meta):
            steps.append(int(name.split("_")[1]))
    return sorted(steps)


@dataclass
class SuperstepDriver:
    """Runs ``state ← step(state)`` loops with periodic committed checkpoints.

    ``every``: checkpoint every N supersteps (1 = every superstep).
    ``counters`` accumulates per-superstep metrics and is persisted in each
    checkpoint's meta (the reference's print_dist_stats analog, made
    machine-readable).
    """

    spark: SparkSession
    checkpoint_dir: str
    every: int = 1
    counters: dict = field(default_factory=dict)
    # test hook: raise after committing this many NEW supersteps (simulated
    # mid-run crash for the kill/resume test)
    kill_after: int | None = None

    def _step_path(self, i: int) -> str:
        return os.path.join(self.checkpoint_dir, f"step_{i:05d}")

    def _write_checkpoint(self, df: DataFrame, i: int, extra: dict) -> DataFrame:
        from pyspark.sql import functions as F

        path = self._step_path(i)
        data_path = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data_path)
        reloaded = self.spark.read.parquet(data_path)
        # per-partition lineage + metrics [north-rule]: row count per parquet
        # file of the committed state — the resume point's physical layout is
        # part of the checkpoint's identity (print_dist_stats made durable)
        per_part = {
            os.path.basename(r["f"]): r["n"]
            for r in reloaded.groupBy(
                F.input_file_name().alias("f")
            ).agg(F.count("*").alias("n")).collect()
        }
        rows = sum(per_part.values())
        parent = self._step_path(self.last_committed) if self.last_committed >= 0 else None
        meta = {
            "superstep": i,
            "rows": rows,
            "schema": reloaded.schema.simpleString(),
            "lineage": {
                "parent": parent,
                "checkpoint_dir": self.checkpoint_dir,
                "partitions": per_part,
            },
            "counters": dict(self.counters),
            **extra,
        }
        # commit protocol: meta written to a temp file then atomically renamed
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=2)
        os.rename(tmp, os.path.join(path, META_NAME))
        self.last_committed = i
        return reloaded

    def run(
        self,
        init: DataFrame,
        step: Callable[[DataFrame], DataFrame],
        converged: Callable[[DataFrame, DataFrame, int], bool],
        max_iter: int,
        state_schema: str,
    ) -> DataFrame:
        """Run to convergence (or ``max_iter``), resuming from the latest
        committed checkpoint if one exists."""
        kill_after = self.kill_after
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        committed = _committed_steps(self.checkpoint_dir)
        self.last_committed = -1
        if committed:
            start = committed[-1]
            with open(os.path.join(self._step_path(start), META_NAME)) as f:
                meta = json.load(f)
            if meta.get("done"):
                return self.spark.read.parquet(
                    os.path.join(self._step_path(start), "data")
                )
            self.counters.update(meta.get("counters", {}))
            self.last_committed = start
            cur = self.spark.read.parquet(os.path.join(self._step_path(start), "data"))
            first = start + 1
        else:
            cur = self._write_checkpoint(init, 0, {"done": False})
            first = 1

        cur = cur.localCheckpoint(eager=True)
        new_commits = 0
        for i in range(first, max_iter + 1):
            # localCheckpoint bounds lineage between durable checkpoints
            nxt = step(cur).localCheckpoint(eager=True)
            done = converged(cur, nxt, i)
            self.counters[f"superstep_{i}"] = {"superstep": i}
            if done or i == max_iter or (i - first) % self.every == 0:
                self._write_checkpoint(nxt, i, {"done": bool(done)})
                new_commits += 1
                if kill_after is not None and new_commits >= kill_after and not done:
                    raise RuntimeError(f"killed after superstep {i} (test hook)")
            cur = nxt
            if done:
                return cur
        return cur
