"""shifu_spark — a PySpark-native analytics engine with the data-processing
capabilities of ShifuML/shifu (reference: /root/reference, Apache-2.0).

This is NOT a port: the reference runs Pig/MapReduce/Guagua-BSP on Hadoop;
this library re-expresses the observable semantics (column catalog, binning,
WOE/KS/IV/PSI stats, normalization transforms, ensemble scoring, eval
metrics) as idiomatic Spark DataFrame/SQL plans that Catalyst optimizes,
plus MLlib for training — and adds large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the reference never had.

Layout:
  catalog/    — ModelConfig / ColumnConfig dataclasses (the pipeline IR)
  sources/    — delimited-text + parquet ingest with header-sidecar schemas
  functions/  — expression builders (bin lookup, jexl-ish filters, norm)
  operators/  — stats, binning, psi, correlation, normalize, eval, dedup,
                similarity, text analysis
  ml/         — MLlib training / scoring wrappers
  streaming/  — structured-streaming drift (PSI) surface
"""

__version__ = "0.1.0"

from shifu_spark.session import get_spark  # noqa: F401
