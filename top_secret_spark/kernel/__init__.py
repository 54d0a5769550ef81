"""Pure-Python/numpy kernel — no Spark imports anywhere in this package.

Everything here is unit-tested without a SparkSession and wrapped by
Arrow-vectorized pandas UDFs in ``top_secret_spark.operators``.
"""
