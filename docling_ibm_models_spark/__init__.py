"""docling_ibm_models_spark — a from-scratch PySpark-native extraction engine.

Re-creates the data-processing capabilities of DS4SD/docling-ibm-models
(studied read-only at /root/reference) as an idiomatic Spark pipeline:

* main-content extraction over Common-Crawl-style ``pages`` tables
  ``(url, warc_ts, html, text, lang)`` — HTML boilerplate strip + DOM
  heuristics, executed as Arrow-batched pandas UDFs (no per-row Python UDFs),
* layout / table-structure / reading-order operators re-expressed Spark-first
  (spatial theta-joins, band joins, grouped medians, window top-1,
  dense-rank compaction — see SURVEY.md §2),
* large-scale training-data ops: dedup (exact / MinHash-LSH / SimHash),
  similarity search, language-ID, quality scoring, token counting,
* per-partition lineage rows + exact resume from the last committed
  checkpoint.

Everything is built from public knowledge only (PySpark API, the reference
repo's observable behavior, published boilerplate-removal literature).
"""

__version__ = "0.1.0"
