"""File readers/writers behind one facade (reference:
mercury/graph/core/spark_interface.py:115-128).

Thin, honest wrappers over ``ray.data`` readers — the reference exposes
``read_csv/read_parquet/read_json/read_text/read(format)`` on its Spark
session facade; ours map 1:1 onto the Ray Data equivalents and pass
through reader kwargs (``columns=...`` pruning etc.). ``sql``/``udf``
registration (spark_interface.py:130-134) is intentionally out of scope:
the UDF surface of this engine IS ``map_batches`` (SURVEY.md §2.1 S2).
"""

from __future__ import annotations


def read_csv(path, **kw):
    import ray.data as rd

    return rd.read_csv(path, **kw)


def read_parquet(path, **kw):
    import ray.data as rd

    return rd.read_parquet(path, **kw)


def read_json(path, **kw):
    import ray.data as rd

    return rd.read_json(path, **kw)


def read_text(path, **kw):
    import ray.data as rd

    return rd.read_text(path, **kw)


_READERS = {
    "csv": read_csv,
    "parquet": read_parquet,
    "json": read_json,
    "text": read_text,
}


def read(format: str, path, **kw):
    """Dispatch on format name (spark_interface.py:126-128)."""
    try:
        return _READERS[format](path, **kw)
    except KeyError:
        raise ValueError(f"unsupported format {format!r}; one of {sorted(_READERS)}")


def write_parquet(ds, path, **kw):
    return ds.write_parquet(path, **kw)


def write_parquet_resumable(ds, path, partition_col: str):
    """Partitioned parquet write a failed run can resume.

    Layout: ``path/<partition_col>=<value>/*.parquet`` plus a ``_DONE``
    marker per completed partition directory. On a rerun:

    1. partition dirs WITHOUT a marker are partial output from the failed
       attempt — they are deleted;
    2. rows whose partition value already has a marker are filtered out
       BEFORE the write (the skip happens at the stream, nothing is
       re-shuffled or re-written);
    3. the remaining rows are written, then every partition dir present
       gets its marker.

    Markers are written only after ``write_parquet`` returns, so a crash
    mid-write never marks a partition done. Returns the list of partition
    values written by THIS call (empty when everything was already done).

    ``partition_col`` must be integer- or string-typed with no nulls: the
    resume skip matches hive directory names back to column values, which
    is only bijective for types whose string cast equals the directory
    spelling. Directory names are percent-decoded (hive encoding for
    spaces, '=', '/', unicode); floats ('1.0'), timestamps and nulls
    (``__HIVE_DEFAULT_PARTITION__``) would silently re-write or drop rows,
    so they are rejected up front.
    """
    import os
    import shutil
    from urllib.parse import unquote

    import pyarrow as pa
    import pyarrow.compute as pc

    from mercury_graph_ray.stages.util import arrow_types

    ftype = arrow_types(ds).get(partition_col)
    if isinstance(ftype, pa.DataType) and not (
        pa.types.is_integer(ftype)
        or pa.types.is_string(ftype)
        or pa.types.is_large_string(ftype)
    ):
        raise ValueError(
            f"write_parquet_resumable: partition_col {partition_col!r} must be "
            f"integer- or string-typed (got {ftype}); other types don't "
            "round-trip through hive directory names, breaking resume skips"
        )

    done: set[str] = set()
    prefix = f"{partition_col}="
    if os.path.isdir(path):
        for name in os.listdir(path):
            d = os.path.join(path, name)
            if not (os.path.isdir(d) and name.startswith(prefix)):
                continue
            raw = name[len(prefix):]
            if raw == "__HIVE_DEFAULT_PARTITION__":
                raise ValueError(
                    f"write_parquet_resumable: null partition values found at "
                    f"{d}; nulls in {partition_col!r} are not resumable"
                )
            if os.path.exists(os.path.join(d, "_DONE")):
                # pyarrow hive-encodes partition values into directory
                # names (percent-encoding); decode so the skip filter
                # compares in value space
                done.add(unquote(raw))
            else:
                shutil.rmtree(d)  # partial partition from a failed run

    if done:
        done_arr = pa.array(sorted(done))

        def _skip(t: pa.Table) -> pa.Table:
            if t[partition_col].null_count:
                raise ValueError(
                    f"write_parquet_resumable: null values in {partition_col!r} "
                    "are not resumable (hive null partitions don't round-trip)"
                )
            vals = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(_skip, batch_format="pyarrow")

    ds.write_parquet(path, partition_cols=[partition_col])

    written = []
    for name in os.listdir(path):
        d = os.path.join(path, name)
        if os.path.isdir(d) and name.startswith(prefix):
            val = unquote(name[len(prefix):])
            if val not in done:
                written.append(val)
                with open(os.path.join(d, "_DONE"), "w"):
                    pass
    return sorted(written)


def write_csv(ds, path, **kw):
    return ds.write_csv(path, **kw)


def write_json(ds, path, **kw):
    return ds.write_json(path, **kw)
