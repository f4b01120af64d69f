"""PySpark access to the graft engine.

The reference ships a Python context wrapper
(/root/reference python/pyspark_hbase/sql/context.py:26-48,
shell.py:1-44) because its Spark-2 design forks SQLContext. The graft
rebuild is configuration-driven — a V2 catalog plus session
extensions — so PySpark needs no wrapper class at all; this module
just centralizes the three config lines and a demo.

Usage::

    from graft import graft_session
    spark = graft_session(classpath="/path/to/graft/classes").getOrCreate()
    spark.sql("CREATE TABLE graft.db.t (k INT, v STRING) "
              "TBLPROPERTIES('keyCols'='k')")
    spark.sql("INSERT INTO graft.db.t VALUES (1, 'a')")
    spark.sql("SELECT * FROM graft.db.t WHERE k = 1").show()
    spark.sql("SELECT vec_cosine(array(1.0,0.0), array(1.0,0.0))").show()
    # the full native function family is SQL-exposed: vec_cosine,
    # vec_dot, minhash_sig, simhash64, lsh_bucket, winnow_keys,
    # shingle3_hashes, word_hashes, word_window_hashes,
    # distinct_word_hashes, distinct_gram_hashes, shared_count,
    # word_tf_pairs, deletion_variant_hashes
    spark.sql("SELECT size(winnow_keys('some document text here', 8, 4))"
              ).show()

Interactive shell (parity with the reference's shell.py)::

    PYTHONSTARTUP=python/graft.py pyspark ...
"""

from pyspark.sql import SparkSession


def graft_session(builder=None, classpath=None, warehouse=None):
    """Return a SparkSession.Builder configured for graft.

    :param builder: an existing ``SparkSession.builder`` to extend.
    :param classpath: directory or jar with the compiled graft classes
        (added to the driver/executor classpath; not needed if graft is
        already on the Spark classpath).
    :param warehouse: graft warehouse directory (table storage root).
    """
    b = builder or SparkSession.builder
    b = (b.config("spark.sql.extensions", "graft.GraftExtensions")
          .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
          .config("spark.sql.sources.v2.bucketing.enabled", "true")
          .config("spark.sql.session.timeZone", "UTC"))
    if classpath:
        b = (b.config("spark.driver.extraClassPath", classpath)
              .config("spark.executor.extraClassPath", classpath))
    if warehouse:
        b = b.config("spark.sql.catalog.graft.warehouse", warehouse)
    return b


if __name__ == "__main__" or __name__ == "builtins":
    # PYTHONSTARTUP path: announce like the reference shell does
    print("graft engine available: configure with graft.graft_session()")
