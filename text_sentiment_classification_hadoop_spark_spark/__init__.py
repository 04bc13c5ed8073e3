"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``ngwkhai/Text-Sentiment-Classification-Hadoop-Spark``
(binary text sentiment classification: Naive Bayes + linear SVM over
tweet-shaped CSV), rebuilt Spark-first (DataFrame/Catalyst), plus the
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing, streaming).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior (cited by
``file:line`` in docstrings — see SURVEY.md).

Layout
------
- ``session``    : SparkSession factory tuned for scale (AQE, Arrow, parts)
- ``sources``    : tweet CSV reader (compat non-RFC4180 + strict), parquet tables
- ``functions``  : column-expression factories (cleaning chains, tokenize,
                   portable hashing used by dedup/fingerprints)
- ``operators``  : DataFrame->DataFrame operators (NB, SVM, metrics,
                   relational parity ops, dedup, similarity, text analysis,
                   event windows, multimodal)
- ``plans``      : plan-inspection helpers (assert pushdown / broadcast)
- ``streaming``  : Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
