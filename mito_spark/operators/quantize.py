"""Symmetric int8 embedding quantization — the storage-side companion
to the ANN tier (similarity.py): 4x smaller vectors for candidate
generation, full-precision re-rank upstream.

Per vector: scale = 127 / max|x|, q_i = floor(x_i · scale + 0.5)
(explicit half-up — both engines compute the identical integer, no
reliance on engine rounding modes). Everything is per-row array
algebra (one map pass, zero shuffles); the gate output projects
engine-portable SCALARS of the quantized vector (L1 mass, element
checksum, reconstruction error) because the driver's canonicalizer
rejects list columns.

Zero vectors quantize to all-zeros with scale 0 (guarded division),
not an error — error-as-value convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: per-vector int8 quantization manifest:
    (vec_id, scale, q_l1, q_checksum, recon_err)."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(x, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(x, lambda v: F.floor(v * F.col("scale") + F.lit(0.5)).cast("long"))
    dq = F.when(
        F.col("scale") > 0,
        F.transform(F.col("q"), lambda v: v.cast("double") / F.col("scale")),
    ).otherwise(F.transform(F.col("q"), lambda v: v.cast("double")))
    recon = F.array_max(
        F.zip_with(x, F.col("dq"), lambda a, b: F.abs(a - b))
    )
    return (
        emb.withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn("dq", dq)
        .select(
            "vec_id",
            F.round("scale", 6).alias("scale"),
            F.aggregate(
                F.col("q"), F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
            ).alias("q_l1"),
            F.md5(F.concat_ws(",", F.transform(F.col("q"), lambda v: v.cast("string")))).alias(
                "q_checksum"
            ),
            F.round(recon, 6).alias("recon_err"),
        )
    )


QUANTIZE_SQL = """
WITH x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs
  FROM embeddings
), scaled AS (
  SELECT vec_id, xs,
         CASE WHEN list_max(list_transform(xs, v -> abs(v))) > 0
              THEN 127.0 / list_max(list_transform(xs, v -> abs(v)))
              ELSE 0.0 END AS scale
  FROM x
), quant AS (
  SELECT vec_id, xs, scale,
         list_transform(xs, v -> CAST(floor(v * scale + 0.5) AS BIGINT)) AS q
  FROM scaled
), dequant AS (
  SELECT vec_id, xs, scale, q,
         CASE WHEN scale > 0
              THEN list_transform(q, v -> CAST(v AS DOUBLE) / scale)
              ELSE list_transform(q, v -> CAST(v AS DOUBLE)) END AS dq
  FROM quant
)
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_l1,
       md5(array_to_string(list_transform(q, v -> CAST(v AS VARCHAR)), ',')) AS q_checksum,
       ROUND(list_max(list_transform(range(1, len(xs) + 1),
                                     i -> abs(xs[i] - dq[i]))), 6) AS recon_err
FROM dequant
"""
