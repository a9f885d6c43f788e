"""Ping-pong parquet state materializer for iterative algorithms.

Every iterative algo here (PI/MC PageRank, connected components, LPA)
rebinds a small state DataFrame per superstep. Doing that with
``localCheckpoint`` looks cheap but degrades catastrophically in
long-running drivers (measured: flat ~0.5 s/step until ~17 steps, then
2× per step — block-manager/cleaner pathology, independent of AQE and of
reliable ``checkpoint()``; see git history). A parquet round-trip is flat
(measured 120 supersteps at ~0.9 s/step, local[4]) and is also the honest
100 TB design: Pregel-style per-superstep state materialization to DFS,
which is what makes mid-iteration resume possible at all.

Three rotating slots per state name: write i goes to slot ``i % 3``, so
a write never clobbers a directory referenced by the results of the last
TWO ``materialize(name)`` calls. Two slots are not enough in practice:
fixpoint loops that DISCARD a no-change write (e.g. the SCC trim loop —
it writes the re-filtered edge set, sees the count unchanged, and keeps
the OLDER DataFrame) leave the live reader two writes back, and the next
same-name write would delete the very files its own plan scans
(observed: fileNotExistError mid-job under load). Invariant for callers:
a plan passed to ``materialize(name)`` may reference the last two
``name`` results, never older ones.

``CheckpointManager`` (checkpoint.py) is the *durable* variant of this —
same write-then-reread shape plus a commit manifest. StateStore is the
scratch variant for runs that don't need resumability.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

# scratch roots pending cleanup: results returned to callers may still scan
# their scratch slot (the recompute source for a persisted-but-evicted
# DataFrame), so owned roots that are never close()d are reclaimed at
# interpreter exit instead of leaking one mkdtemp per algorithm invocation
_SCRATCH_ROOTS: set[str] = set()


def _cleanup_scratch() -> None:
    for root in list(_SCRATCH_ROOTS):
        shutil.rmtree(root, ignore_errors=True)
    _SCRATCH_ROOTS.clear()


atexit.register(_cleanup_scratch)


class StateStore:
    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self._own = root is None
        # SPARK_GRAFT_SCRATCH relocates scratch state (e.g. to tmpfs for
        # benchmarks: this sandbox has ONE shared disk at every "cluster
        # size", so on-disk scratch couples the N-vs-4N ratio to disk
        # throughput noise — a real 4N-node cluster has 4N local disks).
        # Default stays the system temp dir.
        base = os.environ.get("SPARK_GRAFT_SCRATCH")
        if base:
            os.makedirs(base, exist_ok=True)
        self.root = root or tempfile.mkdtemp(prefix="mcpr_state_", dir=base)
        if self._own:
            _SCRATCH_ROOTS.add(self.root)
        self._seq: dict[str, int] = {}

    def materialize(self, df: DataFrame, name: str = "state") -> DataFrame:
        """Write ``df`` to the name's next slot and return the re-read
        DataFrame (lineage truncated, plan = fresh parquet scan)."""
        seq = self._seq.get(name, 0)
        path = os.path.join(self.root, f"{name}_{seq % 3}")
        # snappy, not the session's zstd: scratch slots live for exactly
        # one superstep (usually on tmpfs/local disk) — encode CPU in the
        # per-step write job matters, storage density doesn't (measured
        # ~2× faster encode for ~1.33× bytes on CSR-shaped data)
        df.write.option("compression", "snappy").mode("overwrite").parquet(path)
        self._seq[name] = seq + 1
        return self.spark.read.parquet(path)

    def close(self) -> None:
        if self._own:
            shutil.rmtree(self.root, ignore_errors=True)
            _SCRATCH_ROOTS.discard(self.root)
