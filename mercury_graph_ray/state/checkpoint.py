"""Per-superstep checkpoint/resume contract (north_rule).

Generalizes the reference's only resume mechanism — node2vec's parquet
path cache (mercury/graph/embeddings/spark_node2vec.py:145-180) — into a
uniform layout every iterative algorithm uses:

    {root}/{algo}/iter_{t:06d}/state/part=<p>/*.parquet  # the state Dataset
    {root}/{algo}/iter_{t:06d}/MANIFEST.json    # written LAST (atomic marker)

(iteration dirs deliberately avoid the ``key=value`` form so parquet
readers never misparse them as hive partition columns)

The manifest records iteration number, convergence metric, per-partition
row counts (lineage), the input fingerprint, and algorithm parameters; a
checkpoint without a manifest is incomplete and ignored. ``latest()``
scans for the newest complete iteration so a killed run resumes at t+1
with bit-identical semantics (state is the complete per-vertex table —
nothing else is needed to restart the superstep loop).
"""

from __future__ import annotations

import json
import os
import time


class CheckpointManager:
    def __init__(self, root: str, algo: str, fingerprint: dict | None = None):
        self.dir = os.path.join(root, algo)
        self.fingerprint = fingerprint or {}
        os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, t: int) -> str:
        return os.path.join(self.dir, f"iter_{t:06d}")

    # public alias (the BSP engine's actors write into this layout)
    iter_dir = _iter_dir

    def write_manifest(self, t: int, metrics: dict) -> None:
        """Scan the written state dir for per-partition lineage and commit
        the manifest (written LAST — the atomic completeness marker)."""
        d = self._iter_dir(t)
        data_dir = os.path.join(d, "state")
        parts = sorted(
            p for p in os.listdir(data_dir) if p.startswith("part=")
        )
        lineage = {}
        for p in parts:
            pdir = os.path.join(data_dir, p)
            lineage[p] = sorted(os.listdir(pdir))
        manifest = {
            "iteration": t,
            "metrics": metrics,
            "fingerprint": self.fingerprint,
            "partitions": lineage,
            "wall_time": time.time(),
        }
        tmp = os.path.join(d, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "MANIFEST.json"))

    def save(self, t: int, state, metrics: dict) -> None:
        """Write state parquet (hive-partitioned by vertex partition) then
        the manifest. Partial writes from a crash leave no manifest and are
        overwritten on retry."""
        data_dir = os.path.join(self._iter_dir(t), "state")
        state.write_parquet(data_dir, partition_cols=["part"], mode="overwrite")
        self.write_manifest(t, metrics)

    def latest(self) -> tuple[int, dict] | None:
        """Newest complete (iteration, manifest) with a matching fingerprint."""
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if not name.startswith("iter_"):
                continue
            mf = os.path.join(self.dir, name, "MANIFEST.json")
            if not os.path.exists(mf):
                continue
            with open(mf) as f:
                manifest = json.load(f)
            if self.fingerprint and manifest.get("fingerprint") != self.fingerprint:
                continue
            t = int(name.split("_", 1)[1])
            if best is None or t > best[0]:
                best = (t, manifest)
        return best

    def load(self, t: int):
        """Read the state Dataset of iteration ``t`` (materialized)."""
        import numpy as np
        import ray.data as rd

        data_dir = os.path.join(self._iter_dir(t), "state")
        ds = rd.read_parquet(data_dir)

        # hive partition column comes back as string/dictionary -> restore int64
        def _fix(batch):
            batch["part"] = np.asarray(batch["part"], dtype=np.int64)
            return batch

        return ds.map_batches(_fix, batch_format="numpy").materialize()
