"""Smoke test for the Python multimodal mapInPandas plumbing.

    python3 python/graft_multimodal_smoke.py <graft-classes> <sf-dir>

Builds the same synthetic media table as the Scala side
(payload = document text bytes), runs feature extraction, frame
sampling, and resize planning, and checks batch-shape invariants.
Prints GRAFT_MM_OK on success.
"""

import sys

from pyspark.sql import functions as F

from graft import graft_session
import graft_multimodal as mm


def main(classpath, sf_dir):
    spark = (graft_session(classpath=classpath)
             .master("local[4]")
             .appName("graft-multimodal-smoke")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    try:
        media = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                 .select(
                     F.col("doc_id").alias("media_id"),
                     F.when(F.col("doc_id") % 2 == 0, "image")
                      .otherwise("audio").alias("kind"),
                     F.col("text").cast("binary").alias("payload"),
                     (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
                     (F.col("n_chars") % 48 + 16).cast("int")
                      .alias("height"))
                 .limit(200))
        n = media.count()

        feats = mm.extract_features(media)
        rows = feats.collect()
        assert len(rows) == n, (len(rows), n)
        assert all(len(r["features"]) == mm.FEATURE_DIM for r in rows)
        # deterministic decode: same input → same features
        again = {r["media_id"]: r["features"]
                 for r in mm.extract_features(media).collect()}
        assert all(again[r["media_id"]] == r["features"] for r in rows)
        # n_bytes metadata consistent with the payload column
        byte_len = {r["media_id"]: r["nb"] for r in media.select(
            "media_id", F.length("payload").alias("nb")).collect()}
        assert all(byte_len[r["media_id"]] == r["n_bytes"] for r in rows)

        frames = mm.sample_frames(media).collect()
        assert len(frames) > n  # multiple frames per payload
        by_media = {}
        for r in frames:
            by_media.setdefault(r["media_id"], []).append(
                (r["frame_no"], r["frame_offset"]))
        for mid, fs in by_media.items():
            fs.sort()
            assert [f[0] for f in fs] == list(range(len(fs)))
            assert all(off == no * 256 for no, off in fs)

        resized = mm.resize_meta(media, max_side=32).collect()
        assert len(resized) == n
        assert all(max(r["new_width"], r["new_height"]) <= 32
                   for r in resized)

        print("GRAFT_MM_OK")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
