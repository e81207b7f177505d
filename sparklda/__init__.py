"""sparklda — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference LDA-TopicModeling-using-PySpark
repo, re-expressed DataFrame/SQL/MLlib-first.

The reference (read-only at /root/reference/) is an RDD + driver-NumPy
collapsed-Gibbs LDA job plus a pandas text-cleaning script. This engine
reproduces the semantics (what is computed) with idiomatic Spark machinery
(how it is computed): declarative DataFrame plans optimized by Catalyst,
sparse long-format aggregates instead of dense one-hot shuffles, MLlib LDA
instead of a driver-side Gibbs loop, and LSH instead of all-pairs similarity.

Modules
-------
session     SparkSession bootstrap tuned for local[32] testing / cluster scale
io          Parquet readers with explicit schemas over the test tables
stopwords   vendored sklearn ENGLISH_STOP_WORDS + reference custom additions
text        cleaning chain F1-F8 and tokenization P1-P3 (SURVEY.md 2.2)
vocab       wordcount, deterministic top-V dictionary, doc encoding (2.3-2.5)
lda         CountVectorizer + MLlib LDA capability M1-M5 (SURVEY.md 2.6)
relational  window/set/grouping-set/approx/join breadth (SURVEY.md 2.8)
dedup       exact + MinHash-LSH + SimHash + n-gram-Jaccard deduplication
similarity  brute-force and LSH-bucketed cosine ANN over embeddings
textstats   language-ID heuristic, quality scoring, token counting, fingerprints
multimodal  binary-column plumbing for image/audio payloads (decode stubbed)
streaming   Structured Streaming windows/watermarks over the events table
"""

__version__ = "0.4.0"
