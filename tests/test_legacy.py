"""Module-level verb parity with the reference package
(`labelspark/__init__.py:1-15`): every legacy name is importable from
the package root and delegates to the distributed implementation.
"""

from __future__ import annotations

import json

import pytest

import labelspark_spark as ls
from labelspark_spark import Client, LocalTransport

LABELS = [
    {
        "DataRowID": "dr-1",
        "Agreement": "91",
        "Label": {
            "objects": [{"title": "car"}],
            "classifications": [{"title": "weather", "answer": "sunny"}],
        },
    },
    {
        "DataRowID": "dr-2",
        "Agreement": "55",
        "Label": {
            "objects": [{"title": "tree"}],
            "classifications": [{"title": "weather", "answer": "rain"}],
        },
    },
]


@pytest.fixture()
def client(spark, tmp_path):
    t = LocalTransport(str(tmp_path / "platform"))
    t.seed_labels("proj-1", LABELS)
    return Client(t, spark)


def test_all_reference_names_importable():
    for name in [
        "add_json_answers_to_dictionary",
        "bronze_to_silver",
        "LABELBOX_DEFAULT_TYPE_DICTIONARY",
        "create_dataset",
        "create_labelbox_dataset",
        "dataframe_schema_enrichment",
        "flatten_bronze_table",
        "get_annotations",
        "get_videoframe_annotations",
        "is_json",
        "jsonToDataFrame",
        "spark_schema_to_string",
        "dictionary_collector",
        "update_metadata",
        "Client",
        # connector.py helper quintet (reference connector.py:20-74)
        "get_col_names",
        "get_unique_values",
        "add_col",
        "get_table_length",
        "rename_col",
    ]:
        assert hasattr(ls, name), name


def test_connector_helper_quintet(spark):
    """Behavioral parity with reference connector.py:20-74: names,
    stringified uniques, literal column, count, rename."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], ["id", "tag"]
    )
    assert ls.get_col_names(df) == ["id", "tag"]
    assert sorted(ls.get_unique_values(df, "tag")) == ["a", "b"]
    # reference stringifies values of ANY type
    assert sorted(ls.get_unique_values(df, "id")) == ["1", "2", "3"]
    # NULL surfaces as Python None — a DELIBERATE divergence from the
    # reference's str(None) == 'None' (see connector.py docstring):
    # the literal string and a genuine NULL must stay distinguishable
    nullable = spark.createDataFrame(
        [("x",), (None,), ("None",)], ["tag"]
    )
    got = ls.get_unique_values(nullable, "tag")
    assert sorted(got, key=lambda v: (v is None, v)) == ["None", "x", None]
    out = ls.add_col(df, "status", "new")
    assert out.columns == ["id", "tag", "status"]
    assert out.filter(out.status == "new").count() == 3
    assert ls.get_table_length(df) == 3
    assert ls.rename_col(df, "tag", "label").columns == ["id", "label"]


def test_is_json_and_dictionary_collector(spark):
    assert ls.is_json('{"a": 1}')
    assert not ls.is_json("not json")
    assert not ls.is_json(None)
    row = spark.range(1).first()
    assert ls.dictionary_collector.return_as_dict(row) == {"id": 0}


def test_add_json_answers_first_wins_and_title_collapse():
    d: dict = {}
    d = ls.add_json_answers_to_dictionary("q1", json.dumps({"title": "yes"}), d)
    assert d == {"q1": "yes"}
    # first-wins: a second answer for the same question is ignored
    d = ls.add_json_answers_to_dictionary("q1", "no", d)
    assert d == {"q1": "yes"}
    # list of dicts folds to comma-joined titles
    d = ls.add_json_answers_to_dictionary("q2", [{"title": "a"}, {"title": "b"}], d)
    assert d["q2"] == "a,b"
    # literal-string list recurses per item (first one wins)
    d = ls.add_json_answers_to_dictionary("q3", "[{'title': 'x'}, {'title': 'y'}]", d)
    assert d["q3"] == "x"


def test_spark_schema_to_string_accepts_json_value(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": {"c": "x"}},)], "s struct<a:int, b:struct<c:string>>"
    )
    paths = list(ls.spark_schema_to_string(df.schema.jsonValue()))
    assert paths == ["s.a", "s.b.c"]
    # StructType works too
    assert list(ls.spark_schema_to_string(df.schema)) == ["s.a", "s.b.c"]


def test_flatten_and_enrichment_delegates(client):
    bronze = ls.get_annotations(client, "proj-1")
    # enrichment applied: Agreement cast per the default dictionary
    assert dict(bronze.dtypes)["Agreement"] == "int"
    flat = ls.flatten_bronze_table(bronze)
    assert "Label.objects" in flat.columns
    silver = ls.bronze_to_silver(bronze.withColumnRenamed("DataRowID", "DataRow ID"))
    assert silver.count() == 2


def test_json_to_dataframe_ignores_sc(spark):
    df = ls.jsonToDataFrame(json.dumps([{"a": 1}, {"a": 2}]), spark, sc=None)
    assert df.count() == 2


def test_create_dataset_legacy_verb(client, spark):
    df = spark.createDataFrame(
        [("photo1.jpg", "https://x/1"), ("photo2.jpg", "https://x/2")],
        ["external_id", "row_data"],
    )
    result = ls.create_dataset(client, df, dataset_id="ds-legacy")
    assert result["dataset_id"] == "ds-legacy"
    spooled = client.transport.spool_path("ds-legacy")
    assert spooled is not None


def test_create_labelbox_dataset_returns_ids(client, spark):
    df = spark.createDataFrame(
        [("photo1.jpg", "https://x/1"), ("photo2.jpg", "https://x/2")],
        ["external_id", "row_data"],
    )
    ds, out = ls.create_labelbox_dataset(client, df, dataset_name="ds-lb")
    assert ds == "ds-lb"
    assert "data_row_id" in out.columns
    assert out.filter(out.data_row_id.isNull()).count() == 0


def test_create_labelbox_dataset_metadata_index_plain_columns(client, spark):
    # reference syntax {plain_column_name: type} (create_labelbox_dataset
    # .py:43-73): plain columns are aliased to the metadata convention
    # form before the ontology sync — no pre-renaming required
    df = spark.createDataFrame(
        [("https://x/1", "train"), ("https://x/2", "test")],
        ["row_data", "split"],
    )
    ds, out = ls.create_labelbox_dataset(
        client, df, dataset_name="ds-mdx", metadata_index={"split": "enum"}
    )
    assert ds == "ds-mdx"
    # the sync reconciled the plain column: the remote ontology now has
    # the field with both observed enum options
    idx = client.export_ontology_index("ds-mdx")
    opts = {
        r.option_name
        for r in idx.filter(idx.field_name == "split").collect()
        if r.option_name is not None
    }
    assert opts == {"train", "test"}
    # and the UPLOADED rows must carry the metadata too (r11 review:
    # the ontology synced but the un-renamed frame was posted, so every
    # data row silently shipped with empty metadata_fields — the
    # reference uploads rows WITH the metadata_index fields)
    posted = spark.read.json(client.transport.spool_path("ds-mdx"))
    by_url = {r["data_row"]["row_data"]: r["data_row"] for r in posted.collect()}
    md1 = {m["name"]: m["value"] for m in by_url["https://x/1"]["metadata_fields"]}
    md2 = {m["name"]: m["value"] for m in by_url["https://x/2"]["metadata_fields"]}
    assert md1 == {"split": "train"} and md2 == {"split": "test"}


def test_get_videoframe_annotations_reference_positional_shape(client, spark):
    client.transport.seed_frames(
        "http://frames/legacy",
        '{"frameNumber":0,"objects":[],"classifications":[]}\n'
        '{"frameNumber":1,"objects":[],"classifications":[]}\n',
    )
    bronze = spark.createDataFrame(
        [("dr-v1", ("http://frames/legacy",))],
        "DataRowID string, Label struct<frames:string>",
    )
    # reference positional order: (bronze, api_key, spark, sc) — api_key/
    # spark/sc accepted and ignored, client resolved from the kwarg
    frames = ls.get_videoframe_annotations(
        bronze, "fake-api-key", spark, None, client=client
    )
    assert frames.count() == 2
    # the engine's (client, bronze) shape still works
    assert ls.get_videoframe_annotations(client, bronze).count() == 2
    with pytest.raises(TypeError, match="client="):
        ls.get_videoframe_annotations(bronze, "fake-api-key", spark, None)


def test_update_metadata_legacy_verb(client, spark):
    client.transport.seed_metadata(
        "ds-meta", [{"data_row_id": "dr-1", "split": "test"}]
    )
    df = spark.createDataFrame(
        [("dr-1", "train"), ("dr-9", "val")], ["data_row_id", "split"]
    )
    out = ls.update_metadata(client, df, "split", "ds-meta")
    got = {r["data_row_id"]: r["split"] for r in out.collect()}
    assert got == {"dr-1": "test", "dr-9": "val"}
