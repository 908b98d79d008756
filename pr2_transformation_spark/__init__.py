"""pr2_transformation_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Analyticsphere/pr2-transformation.

The reference system is a SQL-generating ETL service: it introspects table
schemas, composes one wide SQL projection per endpoint, and delegates all
execution to BigQuery.  This engine keeps the same *planning* surface (the
column-name grammar, clause builders, profiling detectors, merge semantics)
but expresses every plan as a PySpark DataFrame so that Catalyst/Tungsten do
the optimizing and executing — plus an extension surface for large-scale
training-data pipelines (dedup, similarity search, text analysis, streaming).

Layout:
    names        pure column-name grammar (concept IDs, loops, versions)
    config       constants + false-array reference loader
    expressions  row-level Column builders (recode / unwrap / guarded casts)
    profiling    single-pass data profiling (binary / false-array detection)
    operators/   clean_columns, clean_rows, merge_table_versions, sensitive
    sources/     catalog: fully-qualified table name -> DataFrame resolution
    plans/       SQL-audit rendering of composed projections
    functions/   EXT: dedup, similarity search, text analysis, multimodal
    streaming/   EXT: windowed / sessionized event aggregation
    api          service-level entry points mirroring the reference REST API
"""

__version__ = "0.1.0"
