"""ocr_api_spark — a PySpark-native distributed extraction engine.

Re-expresses the query/data-processing capabilities of the reference
OCR field-extraction service (OmMathur23/ocr-api, a single-file Flask
app) as a Spark-first pipeline over Common-Crawl-style page tables:

- ``kernels``   pure-Python extraction kernels (no Spark imports) —
                line-faithful ports of the reference semantics; the
                shared implementation of record for both the pytest
                golden oracle and the Arrow-batched pandas UDFs.
- ``operators`` Spark operators: extraction / match UDF stages, dedup,
                similarity search, text statistics.
- ``sources``   synthetic deterministic ``pages`` generator + readers.
- ``functions`` column-level helpers built on pyspark.sql.functions.
- ``plans``     end-to-end jobs: session tuning, partition/salt layout,
                checkpointed, resumable extraction pipeline.
- ``streaming`` Structured Streaming variant of the pipeline.
"""

__version__ = "0.1.0"
