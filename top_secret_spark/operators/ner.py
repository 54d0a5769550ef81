"""NER model-inference operator (op 7's real-inference shape).

``ship_ner_model`` distributes the model artifact to every executor via
``SparkContext.addFile`` (the SparkFiles channel — works identically on
a 1000-executor cluster and local mode); ``with_ner_entities`` runs
batched inference in a pandas UDF whose worker process loads the model
ONCE (kernel/ner.py load_model singleton), producing the standard
entities column (array<struct<text,tag,score>>) that the scrub path
(operators/scrub.py, pipeline entities_col) already consumes.

Plan shape: scan → ArrowEvalPython(entities) → ArrowEvalPython(scrub) —
map-only, no shuffle; model bytes move once per executor, not per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

ENTITIES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("tag", T.StringType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
)


def ship_ner_model(spark, local_path: str) -> str:
    """Register the model artifact for executor download; returns the
    filename to pass to ``with_ner_entities`` (executors resolve it via
    ``SparkFiles.get``)."""
    import os

    spark.sparkContext.addFile(local_path)
    return os.path.basename(local_path)


def make_ner_entities_udf(model_filename: str):
    """transcript → array<struct<text,tag,score>> via the worker-local
    model singleton.  The closure captures only the FILENAME — the model
    itself is loaded executor-side from SparkFiles, never pickled."""

    @pandas_udf(ENTITIES_TYPE)
    def entities(texts: pd.Series) -> pd.Series:
        from pyspark import SparkFiles

        from ..kernel.ner import load_model

        model = load_model(SparkFiles.get(model_filename))
        return pd.Series([model.extract(t) for t in texts.tolist()])

    return entities


def with_ner_entities(
    df: DataFrame,
    model_filename: str,
    text_col: str = "transcript",
    output_col: str = "entities",
) -> DataFrame:
    return df.withColumn(
        output_col, make_ner_entities_udf(model_filename)(F.col(text_col))
    )
