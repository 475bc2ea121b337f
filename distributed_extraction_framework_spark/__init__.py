"""distributed_extraction_framework_spark — a from-scratch, PySpark-native
knowledge-graph construction engine.

Re-expresses the capabilities of dbpedia/distributed-extraction-framework
(reference at /root/reference, Scala/Spark-1.3/Hadoop) as an idiomatic
Spark SQL / DataFrame pipeline:

* input: a table of Common-Crawl-style web pages
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
* extractor suite (labels, links, categories, templates, infobox, geo, ...)
  as Catalyst projections + one vectorized Arrow/pandas parse pass
* redirect harvesting + transitive resolution via iterative DataFrame
  self-joins (reference: DistRedirects.scala)
* per-page dedup + dataset-multiplexed sink via ``partitionBy`` (reference:
  DistDeduplicatingWriterDestination.scala / DBpediaCompositeOutputFormat.scala)
* entity linking (broadcast Aho-Corasick surface forms, salted candidate join)
* canonicalization via connected components over self-joins
* training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding cosine), ANN similarity search, text quality analysis,
  multimodal column plumbing
* structured-streaming ingestion of event streams

Everything is DataFrame-first: Catalyst plans the physical execution,
pandas UDFs are used only where built-in functions cannot express the
semantics (template parsing, MinHash, Aho-Corasick).
"""

__version__ = "0.1.0"
