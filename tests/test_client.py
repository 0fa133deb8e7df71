"""End-to-end connector flow over the LocalTransport mock: the
reference's top-3 entry points (SURVEY §3) without network.

Round-trips: upload (uploads struct -> executor spool -> distributed
read-back), export (seeded labels -> typed/bronze DataFrame -> silver),
metadata sync, and upsert key reconciliation against remote state.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from labelspark_spark import Client, LocalTransport

LABELS = [
    {
        "DataRowID": "dr-1",
        "Agreement": "91",
        "Created At": "2024-01-02T03:04:05Z",
        "Label": {
            "objects": [{"title": "car"}, {"title": "car"}, {"title": "tree"}],
            "classifications": [
                {"title": "weather", "answer": "sunny"},
                {"title": "weather", "answer": "cloudy"},
            ],
        },
    },
    {
        "DataRowID": "dr-2",
        "Agreement": "55",
        "Created At": "2024-02-03T04:05:06Z",
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
    t.seed_metadata(
        "proj-1",
        [
            {"data_row_id": "dr-1", "split": "train"},
            {"data_row_id": "dr-3", "split": "test"},
        ],
    )
    return Client(t, spark)


def test_export_to_table_typed_and_compat(client):
    df = client.export_to_table("proj-1", type_dictionary={"Agreement": "integer"})
    assert dict(df.dtypes)["Agreement"] == "int"
    assert df.count() == 2

    compat = client.export_to_table("proj-1", string_compat=True)
    # all-strings schema, nested serialized, nulls -> '' (client.py:64-76)
    assert set(t for _, t in compat.dtypes) == {"string"}
    label_json = compat.filter(F.col("DataRowID") == "dr-1").collect()[0]["Label"]
    assert json.loads(label_json)["objects"][0]["title"] == "car"


def test_bronze_to_silver_flow(client):
    bronze = client.get_annotations("proj-1")
    silver = client.bronze_to_silver(
        bronze,
        key_cols=["DataRowID"],
        objects_col="Label.objects",
        classifications_col="Label.classifications",
        object_titles=["car", "tree"],
        question_titles=["weather"],
    )
    rows = {r["DataRowID"]: r for r in silver.collect()}
    assert rows["dr-1"]["car.count"] == 2
    assert rows["dr-1"]["tree.count"] == 1
    # first-wins: dr-1 has two weather answers; array order pins 'sunny'
    assert rows["dr-1"]["weather"] == "sunny"
    assert rows["dr-2"]["weather"] == "rain"


def test_upload_roundtrip_and_skip_duplicates(client, spark):
    table = spark.createDataFrame(
        [
            ("http://x/1.jpg", "k1", "a", "0.9"),
            ("http://x/2.jpg", "k2", "b", None),
        ],
        ["row_data", "key", "metadata///string///source", "metadata///number///score"],
    )
    client.create_data_rows_from_table(
        table, "ds-1", row_data_col="row_data", global_key_col="key"
    )
    # read the "remote" state back as a distributed scan
    posted = spark.read.json(client.transport.spool_path("ds-1"))
    got = {r["data_row"]["global_key"]: r for r in posted.collect()}
    assert set(got) == {"k1", "k2"}
    md = {m["name"]: m for m in got["k1"]["data_row"]["metadata_fields"]}
    assert md["source"]["value"] == "a" and md["source"]["type"] == "string"
    assert md["score"]["value"] == "0.9" and md["score"]["type"] == "number"
    # null-valued metadata cells are filtered out (uploader.py:238 guard)
    assert [m["name"] for m in got["k2"]["data_row"]["metadata_fields"]] == ["source"]

    # second upload with one colliding key: skip_duplicates drops it
    table2 = spark.createDataFrame(
        [("http://x/3.jpg", "k2"), ("http://x/4.jpg", "k3")], ["row_data", "key"]
    )
    client.create_data_rows_from_table(
        table2, "ds-1", row_data_col="row_data", global_key_col="key", skip_duplicates=True
    )
    keys = [r.global_key for r in client.existing_global_keys("ds-1").collect()]
    assert sorted(keys) == ["k1", "k2", "k3"]


def test_upsert_suffixes_colliding_keys(client, spark):
    client.create_data_rows_from_table(
        spark.createDataFrame([("r1", "dup")], ["row_data", "key"]),
        "ds-2",
        row_data_col="row_data",
        global_key_col="key",
    )
    client.upsert_data_rows_from_table(
        spark.createDataFrame([("r2", "dup"), ("r3", "new")], ["row_data", "key"]),
        "ds-2",
        row_data_col="row_data",
        global_key_col="key",
    )
    keys = sorted(r.global_key for r in client.existing_global_keys("ds-2").collect())
    assert keys == ["dup", "dup///1", "new"]


def test_update_metadata_remote_wins_local_fallback(client, spark):
    table = spark.createDataFrame(
        [("dr-1", "old"), ("dr-2", "local")], ["data_row_id", "split"]
    )
    synced = client.update_metadata(table, "proj-1", key_col="data_row_id", value_col="split")
    got = {r.data_row_id: r.split for r in synced.collect()}
    # dr-1 exists remotely -> remote value; dr-2 absent -> local kept
    assert got == {"dr-1": "train", "dr-2": "local"}


def test_update_metadata_empty_remote_keeps_local(client, spark):
    # a project with NO metadata exports '[]' -> zero-column remote
    # frame; the lookup join's columns cannot resolve, so the sync must
    # fall back to the documented semantics (local values kept), not
    # raise AnalysisException (r11 review)
    client.transport.seed_metadata("proj-without-metadata", [])
    table = spark.createDataFrame(
        [("dr-1", "old"), ("dr-2", "local")], ["data_row_id", "split"]
    )
    synced = client.update_metadata(
        table, "proj-without-metadata", key_col="data_row_id", value_col="split"
    )
    got = {r.data_row_id: r.split for r in synced.collect()}
    assert got == {"dr-1": "old", "dr-2": "local"}


def test_delta_verb_roundtrip(client, spark, tmp_path):
    # export -> delta-named sink (parquet fallback here) -> re-upload scan
    path = str(tmp_path / "export_delta")
    df = client.export_to_delta_table("proj-1", path, mode="overwrite")
    assert df.count() > 0
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_default_key_upsert_never_mangles_row_data(client, spark):
    # no global_key_col: the key is DERIVED from row_data into its own
    # column, so suffix reconciliation must leave row_data untouched
    # (previously the suffix landed on row_data itself -> broken asset
    # pointer on every re-upsert)
    t = spark.createDataFrame([("http://x/a.jpg",)], ["row_data"])
    client.create_data_rows_from_table(t, "ds-gk", row_data_col="row_data")
    client.upsert_data_rows_from_table(t, "ds-gk", row_data_col="row_data")
    posted = spark.read.json(client.transport.spool_path("ds-gk"))
    rows = [r["data_row"] for r in posted.collect()]
    assert {r["row_data"] for r in rows} == {"http://x/a.jpg"}
    assert sorted(r["global_key"] for r in rows) == [
        "http://x/a.jpg",
        "http://x/a.jpg///1",
    ]


def test_create_defaults_skip_duplicates_like_reference(client, spark):
    # reference client.py:209 defaults skip_duplicates=True: a colliding
    # key on plain create is DROPPED, not suffixed
    t1 = spark.createDataFrame([("r1", "kA")], ["row_data", "key"])
    t2 = spark.createDataFrame([("r2", "kA"), ("r3", "kB")], ["row_data", "key"])
    client.create_data_rows_from_table(t1, "ds-dflt", row_data_col="row_data", global_key_col="key")
    client.create_data_rows_from_table(t2, "ds-dflt", row_data_col="row_data", global_key_col="key")
    keys = sorted(r.global_key for r in client.existing_global_keys("ds-dflt").collect())
    assert keys == ["kA", "kB"]


def test_client_typed_annotation_roundtrip(client, spark):
    # annotations.csv-shaped fixture through the full upload path: the
    # spooled ndjson carries parsed typed payloads, not raw cell strings
    t = spark.createDataFrame(
        [
            ("http://x/i.jpg", "ka", "[[[10, 20, 30, 40], []]]", "[['opt_a///sub_q///sub_a']]"),
        ],
        ["row_data", "key", "annotation///bbox///boxes", "annotation///radio///weather"],
    )
    client.create_data_rows_from_table(
        t, "ds-ann", row_data_col="row_data", global_key_col="key", typed_annotations=True
    )
    posted = spark.read.json(client.transport.spool_path("ds-ann"))
    row = posted.collect()[0]
    anns = row["annotations"]
    # read-back schema inference merges the per-entry maps into one
    # struct<bbox,radio>; discriminate on non-null
    bbox = json.loads([m["bbox"] for m in anns if m["bbox"] is not None][0])
    assert bbox == {
        "name": "boxes",
        "bbox": {"top": 10.0, "left": 20.0, "height": 30.0, "width": 40.0},
        "classifications": [],
    }
    radio = json.loads([m["radio"] for m in anns if m["radio"] is not None][0])
    assert radio["answer"] == {"name": "opt_a"}
    assert radio["classifications"] == [{"name": "sub_q", "answer": "sub_a"}]


def test_connect_spark_metadata_creates_missing_then_clean(client, spark):
    # partial remote ontology: lang exists with one option, score absent
    client.transport.seed_ontology(
        "proj-1",
        [{
            "schema_id": "m/lang", "name": "lang", "kind": "enum",
            "options": [{"schema_id": "m/lang/en", "name": "en"}],
        }],
    )
    t = spark.createDataFrame(
        [("r1", "en", 5), ("r2", "de", 7)],
        ["row_data", "metadata///enum///lang", "metadata///number///score"],
    )
    recon = client.connect_spark_metadata(t, "proj-1", key_cols=["row_data"])
    issues = {(r.field_name, r.issue) for r in recon.collect()}
    assert issues == {("lang", "missing_option"), ("score", "missing_field")}
    # remote ontology was extended: second reconcile is clean
    again = client.connect_spark_metadata(t, "proj-1", key_cols=["row_data"])
    assert again.count() == 0
    # and every row now resolves to a schema id
    resolved = client.resolve_metadata(t, "proj-1", key_cols=["row_data"])
    assert resolved.filter(F.col("field_schema_id").isNull()).count() == 0
    enum_rows = resolved.filter(F.col("kind") == "enum")
    assert enum_rows.filter(F.col("option_schema_id").isNull()).count() == 0


def test_upsert_with_metadata_after_ontology_sync(client, spark):
    # the upsert-with-metadata path: sync ontology, then upsert twice;
    # spooled rows carry metadata fields and suffixed keys stay intact
    t = spark.createDataFrame(
        [("http://x/1.jpg", "mk1", "de")],
        ["row_data", "key", "metadata///enum///lang"],
    )
    client.connect_spark_metadata(t, "proj-1", key_cols=["key"])
    client.upsert_data_rows_from_table(t, "ds-meta", row_data_col="row_data", global_key_col="key")
    client.upsert_data_rows_from_table(t, "ds-meta", row_data_col="row_data", global_key_col="key")
    posted = spark.read.json(client.transport.spool_path("ds-meta"))
    rows = posted.collect()
    keys = sorted(r["data_row"]["global_key"] for r in rows)
    assert keys == ["mk1", "mk1///1"]
    for r in rows:
        md = {m["name"]: m["value"] for m in r["data_row"]["metadata_fields"]}
        assert md == {"lang": "de"}


def test_video_frame_ingest_through_transport(client, spark):
    # partition-local frame fetch (mapInPandas) -> long typed bronze ->
    # frame-keyed silver; replaces the reference's driver-side requests
    # loop (get_videoframe_annotations.py:28-37)
    client.transport.seed_frames(
        "http://frames/v1",
        '{"frameNumber":0,"objects":[{"title":"car"}],'
        '"classifications":[{"title":"weather","answer":"sunny"}]}\n'
        '{"frameNumber":1,"objects":[{"title":"car"},{"title":"car"}],'
        '"classifications":[{"title":"weather","answer":"rain"}]}\n',
    )
    client.transport.seed_frames(
        "http://frames/v2",
        '{"frameNumber":0,"objects":[],"classifications":[]}\n',
    )
    bronze = spark.createDataFrame(
        [("dr-v1", ("http://frames/v1",)), ("dr-v2", ("http://frames/v2",))],
        "DataRowID string, Label struct<frames:string>",
    )
    frames = client.get_videoframe_annotations(bronze)
    assert frames.count() == 3
    silver = client.bronze_to_silver(
        frames,
        key_cols=["DataRowID", "frameNumber"],
        objects_col="objects",
        classifications_col="classifications",
        object_titles=["car"],
        question_titles=["weather"],
    )
    got = {(r["DataRowID"], r["frameNumber"]): r for r in silver.collect()}
    assert got[("dr-v1", 0)]["car.count"] == 1
    assert got[("dr-v1", 1)]["car.count"] == 2
    assert got[("dr-v1", 1)]["weather"] == "rain"
    assert got[("dr-v2", 0)]["car.count"] is None


def test_python_datasource_partition_fanout(spark):
    """The Python DataSource must expose one input partition per page —
    pagination-as-parallelism is the whole point of the DSv2 shape."""
    from labelspark_spark.sources import python_datasource as pds

    pds.register(spark)
    df = (
        spark.read.format("labelspark_rest")
        .option("pages", "6")
        .option("page_size", "10")
        .option("seed", "fanout")
        .load()
    )
    assert df.rdd.getNumPartitions() == 6
    rows = df.collect()
    assert len(rows) == 60
    # per-partition page purity: every partition holds exactly one page
    pages_per_part = (
        df.select("page")
        .rdd.mapPartitions(lambda it: [len({r.page for r in it})])
        .collect()
    )
    assert all(n == 1 for n in pages_per_part)
