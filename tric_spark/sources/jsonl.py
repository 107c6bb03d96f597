"""JSON-Lines document source/sink — the web-corpus interchange format.

Crawl-derived corpora (Common Crawl WET/WARC derivatives, C4, RefinedWeb,
Dolma) ship as newline-delimited JSON records, one document per line,
usually gzip/zstd part-files. The reference has no text ingestion at all
(it is a TC engine over binary CSR — graph.hpp:346–449); this source makes
JSONL a first-class distributed format for the documents table so a
pipeline can land raw corpus drops without a parquet conversion step.

Scale rules encoded here:

- **Schema is declared, never inferred.** Inference is a full extra scan
  (100 TB read twice) AND nondeterministic under dirty data. Readers pass
  a StructType (default: the engine's documents schema) and malformed
  lines go to a quarantine column instead of killing the job —
  PERMISSIVE + ``columnNameOfCorruptRecord``, the production posture for
  crawl data where some records are always broken.
- **Line-split parallelism.** Spark's JSON scanner splits uncompressed
  (and bzip2/zstd-seekable) part-files by byte range, so one giant file
  is not one giant task; gzip parts parallelize per-file, which is why
  corpus drops ship as many ~100 MB parts. The writer emits one part per
  partition to preserve that property for the next consumer.
- **Compression is a knob, not a format change** (``codec=``; gzip for
  interchange, none for re-scannability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    docs: DataFrame,
    path: str,
    codec: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write one JSON object per line, one part-file per partition."""
    w = docs.write.mode(mode)
    if codec:
        w = w.option("compression", codec)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with a DECLARED schema (no inference scan). Malformed
    lines are dropped (DROPMALFORMED) on the default path; with
    ``keep_corrupt=True`` they are quarantined in ``_corrupt_record``
    (PERMISSIVE) instead — that frame is eagerly cached because Spark
    forbids querying only the corrupt column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the documented
    workaround is to materialize the parse first, which a quarantine
    audit wants anyway). A record that parses but misses a field gets
    NULL — the engine's NULL-text filters downstream handle those."""
    if not keep_corrupt:
        return (
            spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
