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


def write_csv(ds, path, **kw):
    return ds.write_csv(path, **kw)


def write_json(ds, path, **kw):
    return ds.write_json(path, **kw)
