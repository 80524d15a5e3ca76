"""unichem2index_spark — a from-scratch PySpark-native inverted-index builder
and BM25 query engine with the capabilities of chembl/unichem2index.

The reference (Go, /root/reference) is an extract -> transform -> bulk-index
pipeline that delegates indexing/querying to Elasticsearch/Lucene.  This
package implements BOTH halves natively on Spark:

* build half   — ``operators.build``: tokenize (Arrow/JVM), SPIMI per-partition
  posting runs, skew-aware doc-sharded shuffle, k-way sorted merge into
  varbyte-compressed block-max segments, lineage + resume.
* query half   — ``operators.query``: BM25 top-k (exact DataFrame path and
  block-max WAND over compressed segments), count / max-dates / terms-agg
  analytics mirroring extractor/loader.go:239-379.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
