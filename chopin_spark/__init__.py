"""chopin_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of ropensci/chopin
("Spatial Parallel Computing by Hierarchical Data Partitioning") as an
idiomatic PySpark engine: cell-index spatial joins, hierarchical /
objective partitioning with buffer padding, zonal statistics over tiled
rasters, and the large-scale text-pipeline operators (dedup, similarity
search, text analysis) a Common-Crawl-style corpus needs.

Design rules (see SURVEY.md):
- DataFrame/SQL first; Catalyst + AQE do the physical planning.
- Geometry is planar 2-D (the reference runs `sf_use_s2(FALSE)`,
  /root/reference/R/scale_process.R:107). All geometry kernels are
  vectorized numpy inside Arrow-batched pandas UDFs — no per-row Python.
- Cell assignment (regular grid / hex / quad hierarchy) is pure column
  arithmetic, JVM-side, so filters on cells push down to parquet scans.
- Payload columns (`text`, `html`) are never fed to UDFs; byte identity
  per `url` is an enforced invariant.
"""

__version__ = "0.1.0"

EXTENT = (0.0, 0.0, 800_000.0, 600_000.0)  # planar working extent, meters
