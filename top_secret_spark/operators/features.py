"""Language-ID + perplexity as ONE Arrow stage.

Both models are numpy lookups over shared char-n-gram hashing, so they
are computed in a single pandas UDF — one JVM↔Python Arrow crossing per
batch instead of two.  Model tables are lazy executor-local singletons
(built once per Python worker; a real deployment would ship model files
via spark-submit --files and mmap them in the same place).

[north-rule] stages — BASELINE.json north_star (fastText langid,
KenLM-style perplexity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

FEATURES_TYPE = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("lang_conf", T.DoubleType(), False),
        T.StructField("ppl", T.DoubleType(), False),
        T.StructField("top_bigram_frac", T.DoubleType(), False),
    ]
)


@pandas_udf(FEATURES_TYPE)
def text_features_udf(texts: pd.Series) -> pd.DataFrame:
    # imports inside the UDF so executors resolve them after --py-files
    from ..kernel.langid import detect_batch
    from ..kernel.perplexity import perplexity_batch
    from ..kernel.quality import top_bigram_frac

    t = texts.tolist()
    langs, conf = detect_batch(t)
    ppl = perplexity_batch(t)
    rep = [top_bigram_frac(x) for x in t]
    return pd.DataFrame(
        {"lang": langs, "lang_conf": conf, "ppl": ppl, "top_bigram_frac": rep}
    )


def with_text_features(df: DataFrame, text_col: str = "transcript") -> DataFrame:
    """Add lang / lang_conf / ppl / top_bigram_frac in one Arrow pass.

    top_bigram_frac rides along here (rather than Catalyst) because
    computing an array mode with higher-order functions is O(n²) per row;
    a dict count inside the already-paid Python stage is O(n)."""
    return (
        df.withColumn("_feat", text_features_udf(F.col(text_col)))
        .withColumns(
            {
                "lang": F.col("_feat.lang"),
                "lang_conf": F.col("_feat.lang_conf"),
                "ppl": F.col("_feat.ppl"),
                "top_bigram_frac": F.col("_feat.top_bigram_frac"),
            }
        )
        .drop("_feat")
    )
