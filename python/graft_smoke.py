"""End-to-end PySpark smoke test for the graft engine.

Run by PythonApiSpec as a subprocess (and runnable by hand):

    python3 python/graft_smoke.py <graft-classes-dir> <warehouse-dir>

Exercises the same surface the reference's Python shell demos: DDL,
INSERT, a key-pruned SELECT, and a native SQL function registered by
the session extensions. Prints GRAFT_PY_OK on success.
"""

import sys

from graft import graft_session


def main(classpath, warehouse):
    spark = (graft_session(classpath=classpath, warehouse=warehouse)
             .master("local[2]")
             .appName("graft-python-smoke")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.pysmoke")
        spark.sql("DROP TABLE IF EXISTS graft.pysmoke.t")
        spark.sql(
            "CREATE TABLE graft.pysmoke.t (k INT, v STRING) "
            "TBLPROPERTIES('keyCols'='k', 'numRegions'='2')")
        spark.sql(
            "INSERT INTO graft.pysmoke.t "
            "SELECT CAST(id AS INT), concat('v', id) FROM range(0, 100)")

        rows = spark.sql(
            "SELECT v FROM graft.pysmoke.t WHERE k = 42").collect()
        assert len(rows) == 1 and rows[0][0] == "v42", rows

        # pruned plan: the key predicate must cut the region set
        plan = (spark.sql("SELECT v FROM graft.pysmoke.t WHERE k = 42")
                ._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        assert "regions=1" in plan, plan

        # native function from the session extensions
        cos = spark.sql(
            "SELECT vec_cosine(array(1.0D, 2.0D, 3.0D), "
            "array(1.0D, 2.0D, 3.0D)) AS c").collect()[0][0]
        assert abs(cos - 1.0) < 1e-6, cos

        agg = spark.sql(
            "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi "
            "FROM graft.pysmoke.t").collect()[0]
        assert (agg["n"], agg["lo"], agg["hi"]) == (100, 0, 99), agg

        # KLL quantile sketch family (graft-registered aggregates):
        # the p50 of 0..99 must land within the sketch's rank bound
        p50 = spark.sql(
            "SELECT kll_get_quantile(kll_sketch_agg(CAST(k AS DOUBLE)),"
            " 0.5D) AS q FROM graft.pysmoke.t").collect()[0][0]
        assert abs(p50 - 49.5) <= 5.0, p50

        # per-region manifest statistics procedure
        stats = spark.sql(
            "CALL graft.sys.stats(table => 'pysmoke.t')").collect()
        assert len(stats) >= 2, stats
        assert sum(int(r["rows"]) for r in stats) == 100, stats

        # region-aligned metadata delete
        spark.sql("DELETE FROM graft.pysmoke.t WHERE k < 50")
        left = spark.sql(
            "SELECT count(*) AS n, min(k) AS lo FROM graft.pysmoke.t"
        ).collect()[0]
        assert (left["n"], left["lo"]) == (50, 50), left

        # provenance metadata columns
        prov = spark.sql(
            "SELECT count(DISTINCT _graft_region_id) AS r, "
            "count(DISTINCT _graft_file) AS f FROM graft.pysmoke.t"
        ).collect()[0]
        assert prov["r"] >= 1 and prov["r"] == prov["f"], prov

        # row-level UPDATE (group-based copy-on-write rewrite)
        spark.sql("UPDATE graft.pysmoke.t SET v = 'upd' WHERE k >= 90")
        upd = spark.sql(
            "SELECT count(*) AS n FROM graft.pysmoke.t WHERE v = 'upd'"
        ).collect()[0]
        assert upd["n"] == 10, upd
        assert spark.sql(
            "SELECT count(*) AS n FROM graft.pysmoke.t"
        ).collect()[0]["n"] == 50

        spark.sql("DROP TABLE graft.pysmoke.t")
        print("GRAFT_PY_OK")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
