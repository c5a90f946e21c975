"""Per-partition CSR adjacency blocks.

The engine's physical graph layout, descended from the reference's CSR
arrays ``r_ini/r_len/r_sum/r_col/r_wgt``
(mercury/graph/embeddings/graphembeddings.py:155-182) but partitioned:
edges are hash-partitioned by source vertex (``part = src % P`` over dense
content-ordered vids), each partition's out-edges are compiled once into a
static numpy CSR block, and the blocks live in the Ray object store —
zero-copy shared-memory reads from every scatter task, built once and
reused across all supersteps of all algorithms.

Build path is driver-data-free and resumable: the encoded edge table is
written as hive-partitioned parquet (``part=<p>/``), then P independent
Ray tasks compile their partition. At 1e12-edge scale nothing ever passes
through the driver; the parquet layout doubles as the ingest checkpoint.

Local ids: vertex ``v`` lives in partition ``v % P`` at local row
``v // P`` — O(1) both ways, no lookup tables, and a vertex's partition is
computable anywhere (what the contribution shuffle keys on).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pyarrow as pa


@dataclasses.dataclass
class CsrBlock:
    """Static adjacency of one source partition (all out-edges of the
    vertices in this partition), in two static edge orders:

    - **src-major** (``indptr/dst/weight/w_norm/row_of_edge/dst_inv``):
      edges sorted by local source row — the walk/sampling layout.
    - **dst-major** (``row_by_dst/w_norm_by_dst/weight_by_dst`` +
      ``dst_seg_starts``): the same edges sorted by destination, so the
      per-superstep pre-combine (sum/min per unique destination) is one
      sequential ``np.*.reduceat`` instead of a ``bincount`` scatter into
      a U_p-sized array — random cacheline-granular writes were the
      memory-bandwidth term behind the measured ~128M edges/s/superstep
      socket plateau (BASELINE.md round 2). ``row_by_dst`` is int32 when
      E_p < 2^31 (the 10^8-edges-per-partition design regime), halving
      the per-edge index traffic.

    ``uniq_dst`` is grouped by owning partition (``dst % P``, ascending
    vid within each group; ``uniq_part_starts`` are the group bounds), so
    per-destination-partition payloads are contiguous slices of the
    reduceat output — no per-superstep fancy-index gather."""

    part: int
    n_parts: int
    n_vertices: int
    n_local: int
    indptr: np.ndarray  # int64 [n_local+1]
    dst: np.ndarray  # uint64 [E_p]  global dst vids, sorted by local row
    weight: np.ndarray  # float64 [E_p]
    w_norm: np.ndarray  # float64 [E_p]  weight / out_weight_sum(src)
    row_of_edge: np.ndarray  # int64 [E_p]  local source row per edge
    uniq_dst: np.ndarray  # uint64 [U_p]  unique dst vids, grouped by dst % P
    dst_inv: np.ndarray  # int64 [E_p]  index of each edge's dst in uniq_dst
    dangling: np.ndarray  # bool [n_local]  rows with no out-edges
    uniq_part_starts: np.ndarray  # int64 [P+1]  uniq_dst group bounds per partition
    row_by_dst: np.ndarray  # int32/int64 [E_p]  local source row, dst-major order
    w_norm_by_dst: np.ndarray  # float64 [E_p]  w_norm, dst-major order
    weight_by_dst: np.ndarray  # float64 [E_p]  weight, dst-major order
    dst_seg_starts: np.ndarray  # int64 [U_p]  reduceat starts per uniq_dst

    @property
    def n_edges(self) -> int:
        return len(self.dst)


def n_local_vertices(n_vertices: int, part: int, n_parts: int) -> int:
    """Vertices {part, part+P, part+2P, ...} < n_vertices."""
    if part >= n_vertices:
        return 0
    return (n_vertices - part - 1) // n_parts + 1


def local_ids(n_vertices: int, part: int, n_parts: int) -> np.ndarray:
    """Global vids of the partition's local rows, in row order."""
    return np.arange(part, n_vertices, n_parts, dtype=np.uint64)


def compile_block(
    part: int,
    n_parts: int,
    n_vertices: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None,
) -> CsrBlock:
    """Compile one partition's edges (src all ≡ part mod P) into a CSR block."""
    n_local = n_local_vertices(n_vertices, part, n_parts)
    src = np.asarray(src, dtype=np.uint64)
    dst = np.asarray(dst, dtype=np.uint64)
    w = (
        np.ones(len(src), dtype=np.float64)
        if weight is None
        else np.asarray(weight, dtype=np.float64)
    )
    local = (src // n_parts).astype(np.int64)
    order = np.argsort(local, kind="stable")
    local, dst, w = local[order], dst[order], w[order]
    counts = np.bincount(local, minlength=n_local)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    row_of_edge = np.repeat(np.arange(n_local, dtype=np.int64), counts)
    row_w_sum = np.bincount(local, weights=w, minlength=n_local)
    with np.errstate(divide="ignore", invalid="ignore"):
        w_norm = w / row_w_sum[row_of_edge]
    uniq_dst, dst_inv = np.unique(dst, return_inverse=True)
    # regroup unique destinations by owning partition so payload slices
    # per destination partition are contiguous (value-ascending in-group)
    q_of_uniq = (uniq_dst % np.uint64(n_parts)).astype(np.int64)
    perm = np.argsort(q_of_uniq, kind="stable")
    uniq_dst = uniq_dst[perm].astype(np.uint64)
    inv_perm = np.empty(len(perm), np.int64)
    inv_perm[perm] = np.arange(len(perm), dtype=np.int64)
    dst_inv = inv_perm[dst_inv.astype(np.int64, copy=False)]
    uniq_part_starts = np.searchsorted(
        q_of_uniq[perm], np.arange(n_parts + 1)
    ).astype(np.int64)
    # dst-major static edge layout: sequential reduceat pre-combines
    order_by_dst = np.argsort(dst_inv, kind="stable")
    # the stored VALUES are local row ids (< n_local), so the downcast
    # guard must bound n_local, not the edge count — a 3e9-vertex /
    # 1e8-edge partition would otherwise wrap row ids negative and
    # silently gather the wrong vertices' state
    idx_t = np.int32 if n_local < (1 << 31) else np.int64
    row_by_dst = row_of_edge[order_by_dst].astype(idx_t)
    w_norm_by_dst = w_norm[order_by_dst]
    weight_by_dst = w[order_by_dst]
    dst_seg_starts = np.searchsorted(
        dst_inv[order_by_dst], np.arange(len(uniq_dst))
    ).astype(np.int64)
    dangling = counts == 0
    return CsrBlock(
        part=part,
        n_parts=n_parts,
        n_vertices=n_vertices,
        n_local=n_local,
        indptr=indptr,
        dst=dst,
        weight=w,
        w_norm=w_norm,
        row_of_edge=row_of_edge,
        uniq_dst=uniq_dst,
        dst_inv=dst_inv,
        dangling=dangling,
        uniq_part_starts=uniq_part_starts,
        row_by_dst=row_by_dst,
        w_norm_by_dst=w_norm_by_dst,
        weight_by_dst=weight_by_dst,
        dst_seg_starts=dst_seg_starts,
    )


def _compile_from_parquet(path: str, part: int, n_parts: int, n_vertices: int) -> CsrBlock:
    import pyarrow.parquet as pq

    part_dir = os.path.join(path, f"part={part}")
    if not os.path.isdir(part_dir):
        return compile_block(
            part, n_parts, n_vertices, np.array([], np.uint64), np.array([], np.uint64), None
        )
    tbl = pq.read_table(part_dir, columns=["src", "dst", "weight"])
    return compile_block(
        part,
        n_parts,
        n_vertices,
        tbl["src"].combine_chunks().to_numpy(zero_copy_only=False),
        tbl["dst"].combine_chunks().to_numpy(zero_copy_only=False),
        tbl["weight"].combine_chunks().to_numpy(zero_copy_only=False),
    )


def build_csr_blocks(edges_enc, n_vertices: int, n_parts: int, workdir: str) -> dict:
    """Encoded edges Dataset (src,dst: uint64, weight: float64) -> object-store
    CSR blocks ``{part: ObjectRef[CsrBlock]}``.

    Writes hive-partitioned parquet under ``workdir/edges_by_part`` (the
    durable ingest artifact), then compiles each partition in its own Ray
    task. Reuses an existing complete layout (marker file) on re-entry.
    """
    import pyarrow.compute as pc
    import ray

    layout = os.path.join(workdir, "edges_by_part")
    marker = os.path.join(workdir, "edges_by_part.DONE")
    if not os.path.exists(marker):

        def _with_part(t: pa.Table) -> pa.Table:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            part = (src % np.uint64(n_parts)).astype(np.int64)
            cols = {"src": t["src"], "dst": t["dst"], "part": pa.array(part)}
            if "weight" in t.schema.names:
                cols["weight"] = pc.cast(t["weight"], pa.float64())
            else:
                cols["weight"] = pa.array(np.ones(t.num_rows, np.float64))
            return pa.table(cols)

        edges_enc.map_batches(_with_part, batch_format="pyarrow").write_parquet(
            layout, partition_cols=["part"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    compile_task = ray.remote(num_cpus=1)(_compile_from_parquet)
    return {
        p: compile_task.remote(layout, p, n_parts, n_vertices) for p in range(n_parts)
    }
