"""mercury_graph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
reference library ``stellarXlabs/mercury-graph`` (see SURVEY.md), built
natively on ``ray.data.Dataset`` pipelines: stateless ``map_batches`` over
zero-copy Arrow batches for per-record transforms, groupby-aggregate
shuffles keyed on destination vertex for the iterative gather-scatter
algorithms, per-partition CSR adjacency blocks held in the object store,
and per-superstep parquet checkpoints for resume.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()``; the
caller (driver, bench.py, or the test fixture) owns the Ray session.
"""

from mercury_graph_ray.graph import Graph

__version__ = "0.1.0"

__all__ = ["Graph", "__version__"]
