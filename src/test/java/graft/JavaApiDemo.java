package graft;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;

/**
 * Java face of the engine (the reference ships a JavaAPISuite —
 * /root/reference src/test/java/.../JavaAPISuite.java): the catalog,
 * SQL surface, and DataFrame API are plain Spark, so Java callers need
 * no bridging. Driven from JavaApiSpec.
 */
public final class JavaApiDemo {

    private JavaApiDemo() {}

    /** DDL + insert + pruned point query, all through the Java API. */
    public static long roundTrip(SparkSession spark) {
        spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.javademo");
        spark.sql("DROP TABLE IF EXISTS graft.javademo.jt");
        spark.sql("CREATE TABLE graft.javademo.jt (k INT, v STRING) "
                + "TBLPROPERTIES('keyCols'='k')");
        spark.sql("INSERT INTO graft.javademo.jt VALUES (1, 'a'), (2, 'b'), (3, 'c')");
        Dataset<Row> df = spark.table("graft.javademo.jt")
                .filter("k >= 2")
                .selectExpr("k", "upper(v) AS vu")
                .orderBy("k");
        Row first = df.collectAsList().get(0);
        long n = df.count();
        boolean ok = first.getInt(0) == 2 && first.getString(1).equals("B");
        spark.sql("DROP TABLE graft.javademo.jt");
        return ok ? n : -1L;
    }
}
