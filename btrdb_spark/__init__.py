"""btrdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SoftwareDefinedBuildings/btrdb.

Not a port: the reference's COW-tree/Ceph/etcd machinery is re-expressed as
idiomatic Spark DataFrame plans (see SURVEY.md). The package layout:

- ``session``    SparkSession factory tuned for the target cluster shape
- ``schemas``    canonical schemas + time-domain constants
- ``sources``    points/streams table readers & the events->points mapping
- ``operators``  the BTrDB query surface (raw, windows, nearest, changes, ...)
- ``functions``  scale-out data-pipeline functions (dedup, similarity, text)
- ``plans``      the multi-resolution rollup ladder (the one custom piece)
- ``streaming``  Structured Streaming ingest (PQM-buffer analog)
- ``metadata``   stream metadata plane (create/lookup/annotations/collections)
- ``engine``     a thin BTrDB-like facade binding it all together
"""

__version__ = "0.1.0"
