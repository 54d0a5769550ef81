"""NER model-inference stage: gazetteer artifact, worker-local
singleton, SparkFiles shipping, end-to-end scrub without injected
entities (completes op 7 — ref lib/top_secret/text.rb:21-33 holds the
model as a lazy singleton; spec/spec_helper.rb:26-31 injects entities
in CI, which the entities_col path mirrors)."""

import pytest
from pyspark.sql import functions as F


def test_gazetteer_model_roundtrip(tmp_path):
    from top_secret_spark.kernel.ner import load_model, write_gazetteer_model

    p = str(tmp_path / "model.json")
    write_gazetteer_model(
        p, [("Alice Smith", "PERSON", 0.9), ("Paris", "LOCATION", 0.8)]
    )
    m = load_model(p)
    ents = m.extract("Alice Smith met Alice Smith in Paris.")
    # one entity per distinct surface form; longest-first matching
    assert ents == [
        {"text": "Alice Smith", "tag": "PERSON", "score": 0.9},
        {"text": "Paris", "tag": "LOCATION", "score": 0.8},
    ]
    assert m.extract("no names here") == []
    assert m.extract(None) == []
    # word boundary: 'Parisian' must not match 'Paris'
    assert m.extract("A Parisian café") == []


def test_load_model_is_process_singleton(tmp_path):
    from top_secret_spark.kernel.ner import load_model, write_gazetteer_model

    p = str(tmp_path / "model.json")
    write_gazetteer_model(p, [("Bob", "PERSON", 0.9)])
    assert load_model(p) is load_model(p)


def test_model_artifact_is_deterministic(tmp_path):
    from top_secret_spark.kernel.ner import write_gazetteer_model

    a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    entries = [("X Y", "PERSON", 0.7), ("Z", "LOCATION", 0.6)]
    write_gazetteer_model(a, entries)
    write_gazetteer_model(b, entries)
    assert open(a).read() == open(b).read()


def test_bad_format_raises(tmp_path):
    import json

    from top_secret_spark.kernel.ner import load_model

    p = str(tmp_path / "bad.json")
    json.dump({"format": "other", "entries": []}, open(p, "w"))
    with pytest.raises(ValueError, match="format"):
        load_model(p)


def test_ner_inference_end_to_end_scrub(spark, tmp_path):
    from top_secret_spark.kernel.ner import write_gazetteer_model
    from top_secret_spark.operators.ner import ship_ner_model, with_ner_entities
    from top_secret_spark.operators.scrub import with_scrub
    from top_secret_spark.util import ship_package

    ship_package(spark)
    p = str(tmp_path / "gaz.json")
    write_gazetteer_model(
        p,
        [
            ("Ralph Mason", "PERSON", 0.9),
            ("Boston", "LOCATION", 0.8),
            ("Ghost", "PERSON", 0.3),  # below the 0.5 threshold
        ],
    )
    fname = ship_ner_model(spark, p)
    df = spark.createDataFrame(
        [(i, f"Ralph Mason and Ghost left Boston on day {i}.")
         for i in range(40)],
        ["doc_id", "transcript"],
    ).repartition(7)  # inference must run on executors, many partitions
    out = with_scrub(
        with_ner_entities(df, fname), text_col="transcript",
        entities_col="entities",
    )
    rows = out.select("doc_id", "scrubbed").collect()
    assert len(rows) == 40
    for r in rows:
        assert r["scrubbed"] == (
            f"[PERSON_1] and Ghost left [LOCATION_1] on day {r['doc_id']}."
        )


def test_ner_entities_column_schema(spark, tmp_path):
    from top_secret_spark.kernel.ner import write_gazetteer_model
    from top_secret_spark.operators.ner import (
        ENTITIES_TYPE,
        ship_ner_model,
        with_ner_entities,
    )
    from top_secret_spark.util import ship_package

    ship_package(spark)
    p = str(tmp_path / "gaz2.json")
    write_gazetteer_model(p, [("Key Name", "PERSON", 0.9)])
    fname = ship_ner_model(spark, p)
    df = spark.createDataFrame([(0, "Key Name here")], ["doc_id", "transcript"])
    out = with_ner_entities(df, fname)
    assert out.schema["entities"].dataType == ENTITIES_TYPE
    ents = out.collect()[0]["entities"]
    assert [(e["text"], e["tag"], e["score"]) for e in ents] == [
        ("Key Name", "PERSON", 0.9)
    ]
