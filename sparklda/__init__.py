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
session     SparkSession bootstrap (env-parameterised cores/shuffle partitions)
io          Parquet/CSV readers with explicit schemas over the test tables
"""

__version__ = "0.4.0"
