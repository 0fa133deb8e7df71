"""Unit tests for the operator library (beyond oracle parity)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import ArrayType, StructType

from labelspark_spark.operators import enrich, flatten, multimodal, silver, uploads
from labelspark_spark.sources import json_literal_to_df

from .conftest import SF_SMOKE


def test_json_literal_to_df_infers_nested(spark):
    df = json_literal_to_df(
        spark, '[{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": "y"}}]'
    )
    rows = df.orderBy("a").collect()
    assert [r.a for r in rows] == [1, 2]
    assert rows[0].b.c == "x"


def test_schema_paths_descends_structs_and_arrays(spark):
    df = json_literal_to_df(
        spark, '{"a": 1, "b": {"c": "x", "d": {"e": 2}}, "arr": [{"f": 3}]}'
    )
    paths = flatten.schema_paths(df.schema)
    assert "b.c" in paths and "b.d.e" in paths and "arr.f" in paths and "a" in paths


def test_flatten_structs_names(spark):
    df = json_literal_to_df(spark, '{"a": 1, "b": {"c": "x", "d": {"e": 2}}}')
    flat = flatten.flatten_structs(df, sep="_")
    assert set(flat.columns) == {"a", "b_c", "b_d_e"}


def test_flatten_explodes_arrays_of_arrays(spark):
    df = json_literal_to_df(spark, '{"id": 1, "m": [[1, 2], [3]]}')
    flat = flatten.flatten(df)
    vals = sorted(r.m for r in flat.collect())
    assert vals == [1, 2, 3]
    assert not any(
        isinstance(f.dataType, (ArrayType, StructType)) for f in flat.schema.fields
    )


def test_flatten_outer_keeps_empty_arrays(spark):
    df = json_literal_to_df(spark, '[{"id": 1, "m": [5]}, {"id": 2, "m": []}]')
    flat = flatten.flatten(df, outer=True)
    assert flat.count() == 2


def test_enrich_types_raise_on_missing(spark):
    df = spark.range(3).withColumnRenamed("id", "x")
    with pytest.raises(KeyError):
        enrich.enrich_types(df, {"nope": "integer"}, errors="raise")
    out = enrich.enrich_types(df, {"x": "string", "nope": "integer"}, errors="skip")
    assert dict(out.dtypes)["x"] == "string"


def test_enrich_default_dictionary(spark):
    df = spark.createDataFrame(
        [("5", "2024-01-01 00:00:00", "1.5")],
        ["Agreement", "Created At", "Seconds to Label"],
    )
    out = enrich.enrich_types(df)
    types = dict(out.dtypes)
    assert types["Agreement"] == "int"
    assert types["Created At"] == "timestamp"
    assert types["Seconds to Label"] == "float"


def test_normalize_nulls_and_string_frame(spark):
    df = json_literal_to_df(spark, '[{"a": null, "b": {"c": 1}, "n": 7}]')
    out = enrich.normalize_nulls(df)
    row = out.collect()[0]
    assert row.a == ""
    assert row.b == '{"c":1}'
    sf = enrich.to_string_frame(df)
    assert all(t == "string" for _, t in sf.dtypes)


def test_parse_convention_columns():
    cols = ["plain", "metadata///string///tag", "annotation///bbox///box"]
    conv = uploads.parse_convention_columns(cols)
    assert len(conv) == 2
    assert conv[0].kind == "metadata" and conv[0].value_type == "string"
    assert conv[1].name == "box"


def test_build_uploads_single_projection(spark):
    df = spark.createDataFrame(
        [("u1", "g1", "m1", None), ("u2", "g2", None, "a2")],
        ["row_data", "gk", "metadata///string///tag", "attachment///image///img"],
    )
    out = uploads.build_uploads(df, "row_data", global_key_col="gk")
    rows = {r.gk: r.uploads for r in out.collect()}
    assert rows["g1"].data_row.row_data == "u1"
    assert len(rows["g1"].data_row.metadata_fields) == 1
    assert len(rows["g1"].data_row.attachments) == 0
    assert len(rows["g2"].data_row.metadata_fields) == 0
    assert rows["g2"].data_row.attachments[0]["value"] == "a2"
    # no Python UDF in the plan: whole projection is native
    assert "BatchEvalPython" not in out._jdf.queryExecution().executedPlan().toString()


def test_object_counts_and_answers_wide(spark):
    bronze = spark.createDataFrame(
        [
            (1, [{"title": "car"}, {"title": "car"}, {"title": "dog"}],
             [{"title": "q1", "answer": "yes"}, {"title": "q1", "answer": "IGNORED"}]),
            (2, [{"title": "dog"}],
             [{"title": "q1", "answer": "no"}]),
        ],
        "id long, objs array<struct<title:string>>, cls array<struct<title:string,answer:string>>",
    )
    counts = silver.object_counts_wide(bronze, ["id"], "objs", titles=["car", "dog"])
    got = {r.id: (r["car.count"], r["dog.count"]) for r in counts.collect()}
    assert got == {1: (2, 1), 2: (None, 1)}
    answers = silver.answers_wide(bronze, ["id"], "cls", titles=["q1"])
    got_a = {r.id: r.q1 for r in answers.collect()}
    assert got_a == {1: "yes", 2: "no"}  # first-wins deterministic


def test_bronze_to_silver_end_to_end(spark):
    bronze = spark.createDataFrame(
        [(1, [{"title": "car"}], [{"title": "q", "answer": "a"}])],
        "DataRowID long, objs array<struct<title:string>>, cls array<struct<title:string,answer:string>>",
    )
    out = silver.bronze_to_silver(
        bronze, ["DataRowID"], objects_col="objs", classifications_col="cls",
        object_titles=["car"], question_titles=["q"],
    )
    row = out.collect()[0]
    assert row["car.count"] == 1 and row["q"] == "a"


def test_checklist_fold(spark):
    df = spark.createDataFrame(
        [(1, [{"title": "a"}, {"title": "b"}])],
        "id long, items array<struct<title:string>>",
    )
    out = df.select(silver.checklist_fold(F.col("items")).alias("joined"))
    assert out.collect()[0].joined == "a,b"


def test_multimodal_decode_stub(spark):
    df = spark.createDataFrame([("m1", b"abc"), ("m2", None)], ["media_id", "content"])
    feats = multimodal.decode_features(df)
    got = {r.media_id: r for r in feats.collect()}
    assert got["m1"].feat_dim == 3
    assert got["m2"].feat_mean is None
    # PNG pixel decode is real now; other kinds keep the honest stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(df, kind="audio", require_real_codec=True)
    # image + real codec: non-PNG bytes decode to null features (no crash)
    real = {r.media_id: r for r in
            multimodal.decode_features(df, require_real_codec=True).collect()}
    assert real["m1"].feat_mean is None and real["m1"].feat_dim == 0


def test_png_pixel_roundtrip_and_filters(spark):
    import zlib

    mm = multimodal
    # encoder -> decoder round trip (filter 0)
    px = bytes((r * 7 + c * 3) % 256 for r in range(5) for c in range(4))
    content = mm.png_encode_gray(px, 4, 5)
    w, h, ch, out = mm.png_decode(content)
    assert (w, h, ch) == (4, 5, 1) and out == px

    # hand-built IDAT exercising every filter type (Sub/Up/Average/Paeth)
    import struct

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    width, height = 4, 5
    rows = [bytes((r * 11 + c * 5) % 256 for c in range(width)) for r in range(height)]
    filtered = bytearray()
    for r, filt in enumerate([0, 1, 2, 3, 4]):
        row, prev = rows[r], rows[r - 1] if r else bytes(width)
        filtered.append(filt)
        for i in range(width):
            left = row[i - 1] if i else 0
            ul = prev[i - 1] if i else 0
            if filt == 0:
                filtered.append(row[i])
            elif filt == 1:
                filtered.append((row[i] - left) & 0xFF)
            elif filt == 2:
                filtered.append((row[i] - prev[i]) & 0xFF)
            elif filt == 3:
                filtered.append((row[i] - (left + prev[i]) // 2) & 0xFF)
            else:
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else prev[i] if pb <= pc else ul
                filtered.append((row[i] - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(filtered))) + chunk(b"IEND", b""))
    w2, h2, ch2, out2 = mm.png_decode(png)
    assert out2 == b"".join(rows)

    # distributed decode_pixels: exact mean over known pixels
    df2 = spark.createDataFrame(
        [("p1", content), ("p2", b"not a png"), ("p3", None)],
        ["media_id", "content"],
    )
    got2 = {r.media_id: r for r in mm.decode_pixels(df2).collect()}
    assert (got2["p1"].width, got2["p1"].height) == (4, 5)
    assert abs(got2["p1"].mean_pixel - sum(px) / len(px)) < 1e-9
    assert got2["p2"].mean_pixel is None and got2["p3"].width is None


def test_multimodal_frame_sampling(spark):
    df = spark.createDataFrame(
        [("v1", (None, None, None, 25, None)), ("v2", (None, None, None, 0, None))],
        "media_id string, meta struct<mime:string,width:int,height:int,n_frames:int,sample_rate:int>",
    )
    frames = multimodal.sample_frames(df, every=10)
    got = sorted((r.media_id, r.frame_idx) for r in frames.collect())
    assert got == [("v1", 0), ("v1", 10), ("v1", 20)]


def test_rest_sink_batches(spark):
    import tempfile, os, glob, json as js

    tmp = tempfile.mkdtemp()

    def post(batch):
        # executor-side: write each batch to a file (pluggable transport)
        with open(os.path.join(tmp, f"b{os.getpid()}_{time_ns()}.json"), "w") as f:
            js.dump(batch, f)

    from time import time_ns

    df = spark.range(25).repartition(2)
    from labelspark_spark.sources import rest_sink

    rest_sink(df, post, batch_size=10)
    rows = sum(
        len(js.load(open(p))) for p in glob.glob(os.path.join(tmp, "*.json"))
    )
    assert rows == 25


def test_connected_components_chain_and_islands(spark):
    from labelspark_spark.operators import dedup as dd

    # chain 1-2-3-4 (diameter 3), pair (10,11), isolated-by-absence 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {(r.id, r.comp) for r in dd.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_binned_range_join_matches_naive(spark):
    from labelspark_spark.operators import asof as asof_ops

    points = spark.createDataFrame([(i, float(i * 7 % 100)) for i in range(200)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(j, float(j * 13 % 90), float(j * 13 % 90 + 1 + j % 20)) for j in range(50)],
        "iid long, lo double, hi double",
    )
    naive = asof_ops.range_join(points, intervals, [], "x", "lo", "hi")
    binned = asof_ops.binned_range_join(points, intervals, "x", "lo", "hi", bin_width=8.0)
    n_pairs = lambda df: {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}
    assert n_pairs(naive) == n_pairs(binned)
    assert naive.count() == binned.count()  # exactly-once, no dup matches


def test_asof_join_carries_whole_rows_not_frankenrows(spark):
    # r12 review: the carried values must all come from ONE right row.
    # Per-column ignorenulls carry would (a) resurrect an older value
    # through the latest row's genuine NULL and (b) stitch two rows.
    from labelspark_spark.operators import asof as asof_ops

    left = spark.createDataFrame([(1, 10), (1, 20), (1, 30)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 15, None, None), (1, 25, "c", None)],
        "k long, rts long, v1 string, v2 long",
    )
    out = asof_ops.asof_join(left, right, ["k"], "lts", "rts")
    got = {r.lts: (r.v1, r.v2) for r in out.collect()}
    # lts=10 -> row@5 ('a',100); lts=20 -> row@15 (NULL,NULL) — not
    # ('a',100); lts=30 -> row@25 ('c',NULL) — not ('c',100)
    assert got == {10: ("a", 100), 20: (None, None), 30: ("c", None)}
    # NULL right timestamps never seed the carry
    right2 = spark.createDataFrame(
        [(1, None, "junk", 1), (1, 15, "ok", 2)], "k long, rts long, v1 string, v2 long"
    )
    out2 = asof_ops.asof_join(left, right2, ["k"], "lts", "rts")
    got2 = {r.lts: (r.v1, r.v2) for r in out2.collect()}
    assert got2 == {10: (None, None), 20: ("ok", 2), 30: ("ok", 2)}
    # colliding value-column names are refused, not silently clobbered
    import pytest as _pytest

    left3 = left.withColumn("v1", F.lit("mine"))
    with _pytest.raises(ValueError, match="collide"):
        asof_ops.asof_join(left3, right, ["k"], "lts", "rts")


def test_kmeans_fit_deterministic_and_improving(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from labelspark_spark.functions.vectors import cosine
    from labelspark_spark.operators import similarity as sim
    from labelspark_spark.sources import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings")

    def objective(centroids):
        w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("centroid_id").asc())
        return (
            emb.crossJoin(F.broadcast(centroids))
            .withColumn("_cos", cosine(F.col("embedding").cast("array<double>"), F.col("centroid")))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .agg(F.avg("_cos"))
            .first()[0]
        )

    c0 = sim.kmeans_fit(emb, k=4, dim=64, max_iters=0)
    c5 = sim.kmeans_fit(emb, k=4, dim=64, max_iters=5)
    assert c5.count() == 4
    assert objective(c5) >= objective(c0) - 1e-9
    # deterministic across runs
    again = sim.kmeans_fit(emb, k=4, dim=64, max_iters=5)
    a = sorted(map(tuple, (r.centroid for r in c5.collect())))
    b = sorted(map(tuple, (r.centroid for r in again.collect())))
    assert a == b


def test_upsert_suffix_in_batch_duplicates(spark):
    # duplicate keys WITHIN the incoming batch get suffixed even when the
    # key is new to the dataset (reference posts one row per unique key)
    df = spark.createDataFrame(
        [(1, "k"), (2, "k"), (3, "other")], ["id", "key"]
    )
    empty = spark.createDataFrame([], "key string")
    out = uploads.upsert_keys(df, empty, key_col="key", mode="suffix", order_by="id")
    got = {r.id: r.key for r in out.collect()}
    assert got == {1: "k", 2: "k///1", 3: "other"}


def test_upsert_suffix_counter_spans_existing_family(spark):
    # the counter must account for already-suffixed keys in the existing
    # set: a third upsert of 'k' may not regenerate 'k///1'
    existing = spark.createDataFrame([("k",), ("k///1",)], ["key"])
    df = spark.createDataFrame([(1, "k"), (2, "k")], ["id", "key"])
    out = uploads.upsert_keys(df, existing, key_col="key", mode="suffix", order_by="id")
    got = {r.id: r.key for r in out.collect()}
    assert got == {1: "k///2", 2: "k///3"}
    # bare key free but family occupied: keep bare, then continue past max
    existing2 = spark.createDataFrame([("k///5",)], ["key"])
    out2 = uploads.upsert_keys(df, existing2, key_col="key", mode="suffix", order_by="id")
    got2 = {r.id: r.key for r in out2.collect()}
    assert got2 == {1: "k", 2: "k///6"}


def test_upsert_suffix_keeps_non_colliding_keys_verbatim(spark):
    # r12 ADVICE: a non-colliding key is NEVER rewritten, bare or
    # suffix-form — silent renames would break external references
    empty = spark.createDataFrame([], "key string")
    lone = spark.createDataFrame([(1, "k///7")], ["id", "key"])
    out = uploads.upsert_keys(lone, empty, key_col="key", mode="suffix", order_by="id")
    assert [r.key for r in out.collect()] == ["k///7"]
    # bare key keeps its free slot even when a suffix-form sibling
    # sorts first in the batch (old keep_bare demanded _rn == 1)
    df = spark.createDataFrame([(1, "k///1"), (2, "k")], ["id", "key"])
    out2 = uploads.upsert_keys(df, empty, key_col="key", mode="suffix", order_by="id")
    assert {r.id: r.key for r in out2.collect()} == {1: "k///1", 2: "k"}
    # only the bare exists: an incoming suffix-form key collides with
    # nothing and stays verbatim
    bare = spark.createDataFrame([("k",)], ["key"])
    out3 = uploads.upsert_keys(lone, bare, key_col="key", mode="suffix", order_by="id")
    assert [r.key for r in out3.collect()] == ["k///7"]
    # minted keys dodge verbatim-kept incoming suffixes: 'k' collides
    # with existing, 'k///1' is kept, so the mint lands at 'k///2'
    ex = spark.createDataFrame([("k",)], ["key"])
    mix = spark.createDataFrame([(1, "k"), (2, "k///1")], ["id", "key"])
    out4 = uploads.upsert_keys(mix, ex, key_col="key", mode="suffix", order_by="id")
    assert {r.id: r.key for r in out4.collect()} == {1: "k///2", 2: "k///1"}


def test_connected_components_warns_when_unconverged(spark):
    import warnings

    from labelspark_spark.operators import dedup as dd

    # a 5-node chain has diameter 4; cap at 1 iteration -> must warn
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dd.connected_components(pairs, max_iterations=1)
    assert any("unconverged" in str(x.message) for x in w)


def test_delta_fallback_is_narrow(spark, tmp_path):
    from labelspark_spark.sources import readers, writers

    # classification: only the missing-data-source error triggers fallback
    assert readers._is_missing_delta_source(
        Exception("[DATA_SOURCE_NOT_FOUND] Failed to find the data source: delta.")
    )
    assert not readers._is_missing_delta_source(Exception("schema mismatch on write"))

    # round-trip still works in this jar-less env (memoized fallback)
    df = spark.range(5).withColumnRenamed("id", "x")
    path = str(tmp_path / "dtab")
    writers.write_delta(df, path, mode="overwrite")
    assert readers.read_delta(spark, path).count() == 5

    # a nonexistent path must raise, not silently return something
    with pytest.raises(Exception):
        readers.read_delta(spark, str(tmp_path / "missing")).collect()


def test_annotation_ndjsons_on_reference_fixture(spark):
    # the reference's own test corpus: every annotation kind parses into
    # the platform ndjson payload with zero Python in the plan
    import json

    df = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv("/root/reference/datasets/annotations.csv")
    )
    out = df.select(
        "global_key",
        uploads.annotation_ndjsons(
            "annotation///bbox///sample_bounding_box", "bbox", "sample_bounding_box"
        ).alias("bbox"),
        uploads.annotation_ndjsons(
            "annotation///bbox///sample_nested_bounding_box", "bbox", "nested_bbox"
        ).alias("nbbox"),
        uploads.annotation_ndjsons(
            "annotation///polygon///sample_polygon", "polygon", "sample_polygon"
        ).alias("poly"),
        uploads.annotation_ndjsons(
            "annotation///mask///sample_segmentation_mask", "mask", "seg_mask"
        ).alias("mask"),
        uploads.annotation_ndjsons(
            "annotation///radio///sample_nested_radio_question", "radio", "nested_radio"
        ).alias("nradio"),
        uploads.annotation_ndjsons(
            "annotation///checklist///sample_checklist_question", "checklist", "chk"
        ).alias("chk"),
        uploads.annotation_ndjsons(
            "annotation///text///sample_free_text_question", "text", "ft"
        ).alias("txt"),
    ).collect()
    r0 = next(r for r in out if "gCbn5IeZtE92OaUbyl1ZjQ" in r.global_key)
    b = json.loads(r0.bbox[0])
    assert b == {
        "name": "sample_bounding_box",
        "bbox": {"top": 1853.0, "left": 191.0, "height": 213.0, "width": 304.0},
        "classifications": [],
    }
    nb = json.loads(r0.nbbox[0])
    assert nb["classifications"] == [
        {"name": "sample_tool_sub_text_question", "answer": "Test text"}
    ]
    p = json.loads(r0.poly[0])
    assert p["polygon"][0] == {"x": 3363.98, "y": 1180.19}
    m = json.loads(r0.mask[0])
    assert m["mask"]["png"].startswith("iVBORw0KGgo")
    nr = json.loads(r0.nradio[0])
    assert nr["answer"] == {"name": "sample_branch_radio_answer_1"}
    assert nr["classifications"] == [
        {"name": "sample_sub_radio_question", "answer": "sample_sub_radio_answer_2"}
    ]
    # empty text cell -> no ndjsons
    assert r0.txt == []
    # multi-answer checklist on another row
    multi = [r for r in out if len(r.chk) and "answer_2" in r.chk[0]]
    assert multi and json.loads(multi[0].chk[0])["answers"] == [
        {"name": "sample_checklist_answer_1"},
        {"name": "sample_checklist_answer_2"},
    ]


def test_build_uploads_typed_annotations_single_projection(spark):
    import json

    df = spark.createDataFrame(
        [("u1", "[[[1, 2, 3, 4], ['q///a']]]", "[['yes']]")],
        ["row_data", "annotation///bbox///b", "annotation///radio///r"],
    )
    built = uploads.build_uploads(df, row_data_col="row_data", typed_annotations=True)
    anns = built.select("uploads.annotations").collect()[0][0]
    assert [list(m)[0] for m in anns] == ["bbox", "radio"]
    bbox = json.loads(anns[0]["bbox"])
    assert bbox["bbox"] == {"top": 1.0, "left": 2.0, "height": 3.0, "width": 4.0}
    assert bbox["classifications"] == [{"name": "q", "answer": "a"}]
    assert json.loads(anns[1]["radio"])["answer"] == {"name": "yes"}
    # still zero Python in the plan
    plan = built._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_image_header_codec_python_and_native(spark):
    # real container bytes, no image library: PNG + GIF + JPEG (SOF scan
    # behind a COM segment to exercise the variable-offset walk)
    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    com = b"hello"
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xfe" + (2 + len(com)).to_bytes(2, "big") + com  # COM segment
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    from labelspark_spark.operators.multimodal import parse_image_header

    assert parse_image_header(png) == {"mime": "image/png", "width": 640, "height": 480}
    assert parse_image_header(gif) == {"mime": "image/gif", "width": 320, "height": 200}
    assert parse_image_header(jpeg) == {"mime": "image/jpeg", "width": 1920, "height": 1080}
    assert parse_image_header(b"junk") == {"mime": None, "width": None, "height": None}
    assert parse_image_header(None)["mime"] is None

    # 0xFF fill bytes before a marker must not be read as length-bearing
    # segments (a fill byte would consume the real marker as a bogus
    # segment length and skip past the SOF)
    jpeg_fill = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill/padding bytes
        + b"\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (1080).to_bytes(2, "big") + (1920).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    assert parse_image_header(jpeg_fill) == {
        "mime": "image/jpeg", "width": 1920, "height": 1080,
    }
    # SOS with no SOF before it: stop at entropy-coded data, null dims
    jpeg_sos = b"\xff\xd8" + b"\xff\xda" + (2).to_bytes(2, "big") + b"\x00" * 24
    assert parse_image_header(jpeg_sos)["width"] is None

    df = spark.createDataFrame(
        [("png", png), ("gif", gif), ("jpg", jpeg)], ["media_id", "content"]
    )
    # Arrow-batched python parser handles all three
    got = {r.media_id: r for r in multimodal.decode_image_meta(df).collect()}
    assert (got["png"].width, got["png"].height) == (640, 480)
    assert (got["gif"].width, got["gif"].height) == (320, 200)
    assert (got["jpg"].width, got["jpg"].height) == (1920, 1080)
    # JVM-native path agrees on the fixed-offset formats, nulls JPEG dims
    nat = {r.media_id: r for r in multimodal.image_meta_native(df).collect()}
    assert (nat["png"].mime, nat["png"].width, nat["png"].height) == ("image/png", 640, 480)
    assert (nat["gif"].mime, nat["gif"].width, nat["gif"].height) == ("image/gif", 320, 200)
    assert nat["jpg"].mime == "image/jpeg" and nat["jpg"].width is None
    # native path stays Python-free
    plan = multimodal.image_meta_native(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mp4_parser_handles_truncated_and_empty_boxes():
    from labelspark_spark.operators.multimodal import mp4_encode_skeleton, parse_mp4_header

    good = mp4_encode_skeleton(timescale=600, duration=6000)
    assert parse_mp4_header(good) == {
        "timescale": 600, "duration": 6000, "duration_ms": 10000,
    }
    none = {"timescale": None, "duration": None, "duration_ms": None}
    # empty 8-byte mvhd at buffer end previously raised IndexError
    empty_mvhd = (
        (16).to_bytes(4, "big") + b"ftypisom"
        + (16).to_bytes(4, "big") + b"moov" + (8).to_bytes(4, "big") + b"mvhd"
    )
    assert parse_mp4_header(empty_mvhd) == none
    assert parse_mp4_header(good[:20]) == none
    assert parse_mp4_header(b"") == none
    assert parse_mp4_header(None) == none


def test_wav_native_nulls_non_canonical_layout(spark):
    """A spec-valid PCM WAV with an 18-byte fmt chunk must null out, not
    silently misparse data_size from the shifted offset."""
    from labelspark_spark.operators.multimodal import audio_meta_native, wav_encode_pcm

    canonical = wav_encode_pcm(100, 8000, 1, 16)
    # rebuild with fmt size 18 (cbSize=0) -> 'data' shifts to offset 38
    fmt18 = (
        canonical[:16]
        + (18).to_bytes(4, "little")
        + canonical[20:36]
        + (0).to_bytes(2, "little")
        + canonical[36:]
    )
    df = spark.createDataFrame(
        [(1, bytearray(canonical)), (2, bytearray(fmt18))], "media_id int, content binary"
    )
    rows = {r.media_id: r for r in audio_meta_native(df).collect()}
    assert rows[1].sample_rate == 8000 and rows[1].duration_ms == 12
    assert rows[2].sample_rate is None and rows[2].duration_ms is None


def test_wav_chunk_walk_parses_all_layouts():
    """parse_wav_header (the RIFF chunk walk) must agree with the
    encoder's closed forms on every layout — canonical, 18-byte fmt,
    and fmt+LIST/INFO — and return Nones on garbage."""
    from labelspark_spark.operators.multimodal import parse_wav_header, wav_encode_pcm

    for d in range(9):
        for fmt_ext, li in [
            (False, None),
            (True, None),
            (True, b"IART\x04\x00\x00\x00doc\x00"),
        ]:
            b = wav_encode_pcm(
                100 + d % 50, 8000 * (1 + d % 3), 1 + d % 2, 16,
                fmt_ext=fmt_ext, list_info=li,
            )
            m = parse_wav_header(b)
            exp_ms = ((100 + d % 50) * 1000) // (8000 * (1 + d % 3))
            assert m == {
                "channels": 1 + d % 2,
                "sample_rate": 8000 * (1 + d % 3),
                "bits_per_sample": 16,
                "duration_ms": exp_ms,
            }, (d, fmt_ext, li, m)
    none = {
        "channels": None, "sample_rate": None,
        "bits_per_sample": None, "duration_ms": None,
    }
    for junk in (None, b"", b"RIFF", b"RIFFxxxxWAVE", b"\x00" * 100):
        assert parse_wav_header(junk) == none
    # truncated mid-chunk: walker must stop cleanly, not raise
    assert parse_wav_header(wav_encode_pcm(10)[:20]) == none
    # odd-size LIST payload exercises the word-alignment step
    odd = wav_encode_pcm(10, list_info=b"IART\x03\x00\x00\x00ab\x00"[:11])
    assert parse_wav_header(odd)["channels"] == 1


def test_wav_scan_decode_distributed(spark):
    """decode_audio_meta: the Arrow-batched scan path handles a mixed
    bag of layouts plus a non-WAV row in one frame."""
    from labelspark_spark.operators.multimodal import decode_audio_meta, wav_encode_pcm

    rows = [
        (1, bytearray(wav_encode_pcm(800, 16000, 2, 16))),
        (2, bytearray(wav_encode_pcm(800, 16000, 2, 16, fmt_ext=True))),
        (3, bytearray(wav_encode_pcm(400, 8000, 1, 16, fmt_ext=True,
                                     list_info=b"IART\x04\x00\x00\x00doc\x00"))),
        (4, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "media_id int, content binary")
    got = {r.media_id: r for r in decode_audio_meta(df).collect()}
    assert got[1].sample_rate == 16000 and got[1].duration_ms == 50
    assert got[2].sample_rate == 16000 and got[2].channels == 2
    assert got[3].sample_rate == 8000 and got[3].duration_ms == 50
    assert got[4].sample_rate is None and got[4].duration_ms is None


def test_gif_lzw_round_trip():
    """gif_encode_gray -> gif_decode must round-trip exactly: multi-
    frame, LZW width growth (64x64 random), 12-bit dictionary reset
    (200x200 random), and KwKwK-bearing runs; garbage returns None."""
    import random

    from labelspark_spark.operators.multimodal import gif_decode, gif_encode_gray

    for d in (0, 37, 199):
        frames = [
            bytes((d + r + c + f) % 256 for r in range(4) for c in range(4))
            for f in range(3)
        ]
        assert gif_decode(gif_encode_gray(frames, 4, 4)) == (4, 4, frames)
    rnd = random.Random(7)
    px = bytes(rnd.randrange(256) for _ in range(64 * 64))
    assert gif_decode(gif_encode_gray([px], 64, 64))[2][0] == px
    big = bytes(rnd.randrange(256) for _ in range(200 * 200))
    assert gif_decode(gif_encode_gray([big], 200, 200))[2][0] == big
    # runs of one symbol exercise the KwKwK self-referential code path
    runs = b"\x07" * 256
    assert gif_decode(gif_encode_gray([runs], 16, 16))[2][0] == runs
    good = gif_encode_gray([b"\x00" * 16], 4, 4)
    for junk in (None, b"", b"GIF8", b"GIF89a\x00\x00\x00\x00\x00", good[:30]):
        assert gif_decode(junk) is None


def test_codec_refusal_on_marker_valid_but_truncated_shapes():
    """r11 review regressions: structurally-plausible blobs whose inner
    segments are truncated or inconsistent must REFUSE (None), never
    raise — one IndexError inside mapInPandas kills the whole Spark
    stage. These shapes slipped past the random-junk fuzzing because
    they need valid outer magic with a specific inner truncation."""
    import struct

    from labelspark_spark.operators.multimodal import gif_decode, jpeg_decode_gray

    # truncated SOF body (body[5] indexed past end), empty SOS body,
    # and a short DQT (quant table < 65 bytes)
    assert jpeg_decode_gray(b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x08") is None
    assert jpeg_decode_gray(b"\xff\xd8\xff\xda\x00\x02") is None
    assert jpeg_decode_gray(b"\xff\xd8\xff\xdb\x00\x10" + bytes(12)) is None
    # GIF with a 2-entry color table but 8-bit LZW codes: decoded
    # palette indexes exceed the table and must refuse, not IndexError
    g = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80]) + b"\x00\x00"
        + bytes(6)
        + b"," + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([8]) + bytes([2, 0x00, 0xFF]) + b"\x00" + b";"
    )
    assert gif_decode(g) is None


def test_gif_frame_decode_distributed(spark):
    """decode_gif_frames: one row per frame, nulls (not dropped ids)
    for undecodable payloads."""
    from labelspark_spark.operators.multimodal import decode_gif_frames, gif_encode_gray

    two = gif_encode_gray([bytes(range(16)), bytes(range(16, 32))], 4, 4)
    rows = [(1, bytearray(two)), (2, bytearray(b"not a gif"))]
    df = spark.createDataFrame(rows, "media_id int, content binary")
    got = sorted(
        ((r.media_id, r.frame_id, r.width, r.mean_pixel) for r in decode_gif_frames(df).collect()),
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    assert got[0] == (1, 0, 4, 7.5)
    assert got[1] == (1, 1, 4, 23.5)
    assert got[2][0] == 2 and got[2][1] is None and got[2][3] is None


def test_jpeg_baseline_round_trip():
    """jpeg_encode_gray -> jpeg_decode_gray: exact on DC-only content
    (per-block constants, where unit quantization is lossless), near-
    exact on smooth content, None on everything unsupported."""
    import numpy as np

    from labelspark_spark.operators.multimodal import jpeg_decode_gray, jpeg_encode_gray

    row = bytes([100]) * 8 + bytes([50]) * 8
    img = row * 8  # 16x8: two constant blocks, nonzero DC diff
    w, h, dec = jpeg_decode_gray(jpeg_encode_gray(img, 16, 8))
    assert (w, h) == (16, 8) and dec == img
    # smooth gradient through the full pipeline (AC coefficients, ZRL,
    # EOB, category bits): unit quant keeps error within rounding
    grad = bytes(min(255, r * 3 + c * 2) for r in range(16) for c in range(16))
    w2, h2, dec2 = jpeg_decode_gray(jpeg_encode_gray(grad, 16, 16))
    err = np.abs(
        np.frombuffer(dec2, np.uint8).astype(int) - np.frombuffer(grad, np.uint8).astype(int)
    )
    assert err.max() <= 1, err.max()
    good = jpeg_encode_gray(img, 16, 8)
    for junk in (None, b"", b"\xff\xd8", b"\xff\xd8\xff\xd9", good[:40], b"nope"):
        assert jpeg_decode_gray(junk) is None


def test_decode_pixels_handles_png_and_jpeg(spark):
    """decode_pixels: one frame mixing a PNG, a grayscale JPEG, and a
    non-image — each decoded by whichever real codec recognizes it."""
    from labelspark_spark.operators.multimodal import (
        decode_pixels,
        jpeg_encode_gray,
        png_encode_gray,
    )

    png = png_encode_gray(bytes(range(16)), 4, 4)
    row = bytes([80]) * 8 + bytes([40]) * 8
    jpg = jpeg_encode_gray(row * 8, 16, 8)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpg)), (3, bytearray(b"junk"))],
        "media_id int, content binary",
    )
    got = {r.media_id: r for r in decode_pixels(df).collect()}
    assert got[1].width == 4 and got[1].mean_pixel == 7.5
    assert got[2].width == 16 and got[2].mean_pixel == 60.0
    assert got[3].width is None and got[3].mean_pixel is None


def test_funnel_depth_greedy_subsequence(spark):
    """funnel_depth: strictly ordered subsequence semantics — out-of-order
    steps don't count, repeats may complete the funnel later, and users
    with no funnel events are absent."""
    from datetime import datetime

    from labelspark_spark.operators.events_analytics import funnel_depth

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: view -> click -> purchase in order => depth 3
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE view/click => only view,click counted
        (2, t(1), "purchase"), (2, t(2), "view"), (2, t(3), "click"),
        # u3: click first blocks nothing; later view->click completes 2
        (3, t(1), "click"), (3, t(2), "view"), (3, t(3), "click"),
        # u4: view only => depth 1 (other event types ignored)
        (4, t(1), "signup"), (4, t(2), "view"), (4, t(3), "error"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        r.user_id: r.depth
        for r in funnel_depth(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2, 4: 1}


def test_funnel_depth_repeated_step_pattern(spark):
    """r12 review: a funnel with a REPEATED step (view -> click -> view)
    must be completable. The old array_position mapping sent every
    'view' event to pattern index 0, so index 2 was unreachable."""
    from datetime import datetime

    from labelspark_spark.operators.events_analytics import funnel_depth

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1 completes view -> click -> view => depth 3
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "view"),
        # u2 stops after view -> click => depth 2
        (2, t(1), "view"), (2, t(2), "click"), (2, t(3), "purchase"),
        # u3: click then one view: greedy takes the view as step 1 =>
        # depth 1 (no click after it)
        (3, t(1), "click"), (3, t(2), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        r.user_id: r.depth
        for r in funnel_depth(ev, ["view", "click", "view"]).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}


def test_cohort_retention_counts(spark):
    """cohort_retention: users bucket by first-event day; one row per
    (cohort, offset) with distinct-user counts."""
    from datetime import datetime

    from labelspark_spark.operators.events_analytics import cohort_retention

    rows = [
        (1, datetime(2024, 1, 1, 9)), (1, datetime(2024, 1, 3, 9)),
        (2, datetime(2024, 1, 1, 10)), (2, datetime(2024, 1, 1, 23)),
        (3, datetime(2024, 1, 3, 1)),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r.cohort_day, r.day_offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_containment_pairs_asymmetric(spark):
    """containment_pairs: a short doc fully quoted inside a long one has
    containment 1.0 from the short side but far less from the long side
    — the directional pair survives, the reverse falls under threshold."""
    from labelspark_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated words only here")],
        "doc_id int, text string",
    )
    got = {
        (r.id_a, r.id_b): r.containment_ppm
        for r in containment_pairs(df, threshold_ppm=600_000).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1_000_000
    assert (2, 1) not in got
    assert not any(3 in pair for pair in got)


def test_timeseries_interpolate_values(spark):
    """timeseries_interpolate: gap days get exact linear interpolation
    between neighbors; days before the first / after the last observation
    clamp to the nearest one."""
    from labelspark_spark.queries import q_timeseries_interpolate

    import tempfile
    from datetime import datetime

    # user 1 purchases on day 2 (100.00) and day 5 (400.00); user 2 only
    # on day 3 (50.00). Global spine = days 2..5.
    rows = [
        (1, datetime(2024, 1, 2, 12), 1, "purchase", 100.0, ""),
        (2, datetime(2024, 1, 5, 12), 1, "purchase", 400.0, ""),
        (3, datetime(2024, 1, 3, 12), 2, "purchase", 50.0, ""),
        (4, datetime(2024, 1, 4, 12), 2, "click", 9.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tempfile.mkdtemp(prefix="ts_interp_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        (r.user_id, r.day): (r.cents, r.src)
        for r in q_timeseries_interpolate(spark, d).collect()
    }
    assert got[(1, "2024-01-02")] == (10000, "obs")
    # linear: 10000 + (40000-10000) * 1/3 = 20000; * 2/3 = 30000
    assert got[(1, "2024-01-03")] == (20000, "interp")
    assert got[(1, "2024-01-04")] == (30000, "interp")
    assert got[(1, "2024-01-05")] == (40000, "obs")
    # user 2: day 3 observed, others clamp to it
    assert got[(2, "2024-01-02")] == (5000, "interp")
    assert got[(2, "2024-01-03")] == (5000, "obs")
    assert got[(2, "2024-01-05")] == (5000, "interp")


def test_knn_arrow_bit_parity_with_expression_twin(spark):
    """The Arrow/numpy knn scorer must produce EXACTLY the rows of the
    JVM expression-tree twin — same cos_ppm ranking, same votes — since
    its inner loop replays the identical IEEE mul/add chain."""
    from labelspark_spark.queries import _knn_label_vote_expr, q_knn_label_vote

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in q_knn_label_vote(spark, sf).collect()}
    want = {tuple(r) for r in _knn_label_vote_expr(spark, sf).collect()}
    assert got == want and len(got) > 0


def test_wav_decode_samples_features_and_refusals():
    """wav_decode_samples: exact integer features on a known PCM16 clip;
    stereo/8-bit/malformed inputs return all-None instead of garbage."""
    import struct

    from labelspark_spark.operators.multimodal import (
        wav_decode_samples,
        wav_encode_pcm,
    )

    vals = [100, -200, 300, 0, -1]
    wav = wav_encode_pcm(
        n_samples=len(vals), channels=1, bits=16,
        samples=struct.pack("<5h", *vals),
    )
    f = wav_decode_samples(wav)
    assert f["n_samples"] == 5
    assert f["energy"] == 100**2 + 200**2 + 300**2 + 0 + 1
    assert f["peak"] == 300
    # sign flips: +100/-200, -200/+300, +300/0(nonneg: no... 300->0 both nonneg? 0 is nonneg), 0->-1
    assert f["zero_crossings"] == 3
    import math
    assert f["rms_ppm"] == math.floor(math.sqrt(f["energy"] / 5) * 1e6 + 0.5)

    stereo = wav_encode_pcm(n_samples=4, channels=2, bits=16)
    assert wav_decode_samples(stereo)["n_samples"] is None
    assert wav_decode_samples(b"RIFFjunk")["n_samples"] is None
    assert wav_decode_samples(None)["n_samples"] is None


def test_wav_resample_linear_feats():
    """Rational-ratio linear resampler: identity ratio reproduces the
    input exactly, 2/1 upsample interleaves exact midpoints (floor on
    the +32768-offset signal), and refusals mirror the decode path."""
    import struct

    from labelspark_spark.operators.multimodal import (
        wav_encode_pcm,
        wav_resample_linear_feats,
    )

    vals = [100, -201, 300, 0, -1]
    wav = wav_encode_pcm(
        n_samples=len(vals), channels=1, bits=16,
        samples=struct.pack("<5h", *vals),
    )
    ident = wav_resample_linear_feats(wav, 1, 1)
    assert ident["n_in"] == 5 and ident["n_out"] == 5
    assert ident["sum_out"] == sum(vals)
    assert ident["chk_out"] == sum((j + 1) * v for j, v in enumerate(vals))

    up = wav_resample_linear_feats(wav, 2, 1)
    # midpoints floor toward -inf via the +32768 offset: (100-201)//2 = -51
    mids = [(a + b + 65536) // 2 - 32768 for a, b in zip(vals, vals[1:])]
    expect = [v for pair in zip(vals, mids) for v in pair] + [vals[-1]]
    assert up["n_out"] == 9 and up["n_out"] == len(expect)
    assert up["sum_out"] == sum(expect)
    assert up["chk_out"] == sum((j + 1) * v for j, v in enumerate(expect))

    stereo = wav_encode_pcm(n_samples=4, channels=2, bits=16)
    assert wav_resample_linear_feats(stereo, 3, 4)["n_out"] is None
    assert wav_resample_linear_feats(None, 3, 4)["n_out"] is None


def test_g711_expansion_and_decode():
    """G.711 µ-law/A-law expansion is bit-exact vs the CPython audioop
    reference for all 256 codes (audioop exists on 3.11; skip the
    cross-check if absent — the closed-form spot values still pin the
    tables), and the WAV-level decoder routes fmt tags 6/7 and refuses
    everything else."""
    from labelspark_spark.operators.multimodal import (
        alaw_to_linear,
        ulaw_to_linear,
        wav_decode_samples_g711,
        wav_encode_pcm,
    )

    try:
        import struct
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        for b in range(256):
            assert ulaw_to_linear(b) == struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))[0], b
            assert alaw_to_linear(b) == struct.unpack("<h", audioop.alaw2lin(bytes([b]), 2))[0], b
    except ImportError:
        pass
    # spec spot values: µ-law 0xFF is +0 (complement of silence), A-law
    # 0x55 decodes to -8 (the smallest magnitude, sign-negative)
    assert ulaw_to_linear(0xFF) == 0
    assert ulaw_to_linear(0x7F) == 0
    assert alaw_to_linear(0x55) == -8
    assert alaw_to_linear(0xD5) == 8

    payload = bytes((i * 17) % 256 for i in range(50))
    for tag, codec in ((7, "ulaw"), (6, "alaw")):
        blob = wav_encode_pcm(
            n_samples=50, sample_rate=8000, channels=1, bits=8,
            fmt_tag=tag, samples=payload,
        )
        out = wav_decode_samples_g711(blob)
        assert out["codec"] == codec
        assert out["n_samples"] == 50
        expand = ulaw_to_linear if tag == 7 else alaw_to_linear
        vals = [expand(b) for b in payload]
        assert out["energy"] == sum(v * v for v in vals)
        assert out["peak"] == max(abs(v) for v in vals)
    # refusals: PCM tag, stereo, truncation, garbage
    pcm = wav_encode_pcm(n_samples=10, bits=16)
    assert wav_decode_samples_g711(pcm)["codec"] is None
    assert wav_decode_samples_g711(None)["codec"] is None
    assert wav_decode_samples_g711(b"RIFF")["codec"] is None


def test_parse_exif_roundtrip_and_robustness():
    """exif_encode -> parse_exif round-trips both TIFF byte orders and
    the parser returns all-None on malformed input, never raises."""
    from labelspark_spark.operators.multimodal import exif_encode, parse_exif

    for be, order in ((False, "II"), (True, "MM")):
        blob = exif_encode(6, "CAM3", "2024:01:05 07:00:00", big_endian=be)
        assert parse_exif(blob) == {
            "byte_order": order,
            "orientation": 6,
            "make": "CAM3",
            "datetime": "2024:01:05 07:00:00",
        }
    none = {"byte_order": None, "orientation": None, "make": None, "datetime": None}
    good = exif_encode(1, "X", "2024:01:01 00:00:00")
    assert parse_exif(None) == none
    assert parse_exif(b"") == none
    assert parse_exif(b"\x89PNG") == none          # not a JPEG
    assert parse_exif(good[:6]) == none            # truncated mid-marker
    assert parse_exif(good[:30]) == none           # truncated inside TIFF
    # JPEG without any APP1: plain SOI/EOI
    assert parse_exif(b"\xff\xd8\xff\xd9") == none
    # APP1 present but not EXIF payload
    bad = b"\xff\xd8\xff\xe1\x00\x08XMP\x00\x00\x00\xff\xd9"
    assert parse_exif(bad) == none


def test_parse_exif_short_ascii_inlines():
    """TIFF 6.0: ASCII values whose byte count (incl. NUL) is <= 4 are
    stored INLINE in the value field, not offset-addressed. Real-world
    EXIF with a short Make (e.g. 'LGE\\0', count 4) was misread before
    r6 — the inline bytes were dereferenced as an offset — and the
    encoder mirrored the bug, so round-trips alone couldn't catch it.
    Assert byte-level that the encoder inlines AND that the parser
    reads the inline bytes, both byte orders and both length regimes."""
    from labelspark_spark.operators.multimodal import exif_encode, parse_exif

    for be in (False, True):
        for make in ("A", "LG", "LGE", "CAM3", "NIKON CORPORATION"):
            blob = exif_encode(3, make, "2024:01:05 07:00:00", big_endian=be)
            m = parse_exif(blob)
            assert m["make"] == make, (be, make, m)
            assert m["orientation"] == 3
            assert m["datetime"] == "2024:01:05 07:00:00"
    # byte-level: a count-4 Make appears IN the value field (entry 0's
    # value bytes at TIFF offset 8+2+8..+12), not after the entry table
    blob = exif_encode(1, "LGE", "2024:01:05 07:00:00", big_endian=False)
    tiff = blob[blob.index(b"Exif\0\0") + 6 :]
    assert tiff[18:22] == b"LGE\0"  # inline, left-justified in value field
    # and the out-of-line tail holds ONLY the 20-byte DateTime
    data_start = 8 + 2 + 3 * 12 + 4
    assert tiff[data_start : data_start + 20] == b"2024:01:05 07:00:00\0"


def test_resize_nearest_exact_mapping():
    """Nearest-neighbor resample: source index = dst * src // dst_size
    (floor mapping), per channel, bit-deterministic. Checked on a gray
    8x8 -> 4x4 (even stride) and an RGB 3x3 -> 2x2 (uneven stride)."""
    from labelspark_spark.operators.multimodal import resize_nearest

    gray = bytes(2 * r + 3 * c for r in range(8) for c in range(8))
    out = resize_nearest(gray, 8, 8, 1, 4, 4)
    assert list(out) == [4 * r + 6 * c for r in range(4) for c in range(4)]

    rgb = bytes(
        v for r in range(3) for c in range(3) for v in (10 * r, 10 * c, r + c)
    )
    out2 = resize_nearest(rgb, 3, 3, 3, 2, 2)
    # dst index d maps to src d*3//2: 0->0, 1->1
    expect = []
    for r in (0, 1):
        for c in (0, 1):
            expect += [10 * r, 10 * c, r + c]
    assert list(out2) == expect


def test_ima_adpcm_expansion_and_decode():
    """IMA/DVI ADPCM expansion is bit-exact vs the CPython audioop
    reference (adpcm2lin implements the same IMA loop; audioop packs
    HIGH nibble first while IMA WAV packs LOW first, so the cross-check
    repacks) across varied initial states, and the WAV-level block
    walker handles multi-block files, fact-chunk truncation, and
    refuses non-ADPCM input."""
    import math
    import struct

    from labelspark_spark.operators.multimodal import (
        ima_adpcm_expand,
        wav_decode_samples_adpcm,
        wav_encode_adpcm,
        wav_encode_pcm,
    )

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        for d in range(40):
            n = 40 + d % 16
            nibs = [(d * 7 + i * 5) % 16 for i in range(n)]
            pred0 = ((d * 97) % 1024) - 512
            idx0 = d % 89
            mine = ima_adpcm_expand(pred0, idx0, nibs)[1:]  # drop header sample
            padded = nibs + ([0] if n % 2 else [])
            frag = bytes(
                ((padded[i] << 4) | padded[i + 1]) for i in range(0, len(padded), 2)
            )
            lin, _ = audioop.adpcm2lin(frag, 2, (pred0, idx0))
            vals = list(struct.unpack(f"<{len(lin) // 2}h", lin))[:n]
            assert vals == mine, d
    except ImportError:
        pass

    # multi-block roundtrip: full block + trailing partial block
    blocks = [
        (-300, 12, [(7 * i) % 16 for i in range(40)]),
        (200, 33, [(5 * i + 3) % 16 for i in range(17)]),
    ]
    blob = wav_encode_adpcm(blocks, samples_per_block=41)
    out = wav_decode_samples_adpcm(blob)
    vals = []
    for p0, i0, nbs in blocks:
        vals.extend(ima_adpcm_expand(p0, i0, nbs))
    energy = sum(v * v for v in vals)
    assert out["n_samples"] == len(vals) == 59
    assert out["energy"] == energy
    assert out["peak"] == max(abs(v) for v in vals)
    assert out["zero_crossings"] == sum(
        1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0)
    )
    assert out["rms_ppm"] == math.floor(math.sqrt(energy / len(vals)) * 1e6 + 0.5)
    # the odd nibble count exercises the pad nibble: fact bounds it out
    assert out["n_samples"] == 41 + 18

    # refusals: PCM tag, garbage, empty
    pcm = wav_encode_pcm(n_samples=10, bits=16)
    assert wav_decode_samples_adpcm(pcm)["n_samples"] is None
    assert wav_decode_samples_adpcm(None)["n_samples"] is None
    assert wav_decode_samples_adpcm(b"RIFFxxxxWAVE")["n_samples"] is None


def test_bmp_roundtrip_bottomup_topdown_and_stride():
    """bmp_encode_gray24/bmp_decode: bottom-up storage round-trips to
    top-down pixel order; a hand-flipped negative-biHeight (top-down)
    variant decodes to the SAME pixels; stride padding never leaks."""
    import struct

    from labelspark_spark.operators.multimodal import bmp_decode, bmp_encode_gray24

    # width 5 -> stride 16 (one pad byte per row): the stride quirk live
    px = bytes((10 + r * 5 + c) for r in range(3) for c in range(5))
    blob = bmp_encode_gray24(px, 5, 3)
    w, h, ch, out = bmp_decode(blob)
    assert (w, h, ch) == (5, 3, 3)
    assert out[0::3] == px and out[1::3] == px and out[2::3] == px

    # top-down variant: negate biHeight and reverse the row blocks
    stride = 16
    off = 54
    rows = [blob[off + i * stride : off + (i + 1) * stride] for i in range(3)]
    td = bytearray(blob[:off] + b"".join(reversed(rows)))
    struct.pack_into("<i", td, 22, -3)
    w2, h2, ch2, out2 = bmp_decode(bytes(td))
    assert (w2, h2, ch2) == (5, 3, 3)
    assert out2 == out

    # refusals: truncated body, wrong bpp, compressed
    assert bmp_decode(blob[:53]) is None
    bad_bpp = bytearray(blob); struct.pack_into("<H", bad_bpp, 28, 8)
    assert bmp_decode(bytes(bad_bpp)) is None
    comp = bytearray(blob); struct.pack_into("<I", comp, 30, 1)
    assert bmp_decode(bytes(comp)) is None


def test_oracle_norm_is_dtype_strict():
    """The local compare must be as dtype-strict as the driver's
    pandas-hashtable hash: int64-vs-float64 (the r7 cusum red and 7
    more latent reds found in r8) and decimal-vs-double must MISMATCH
    even when Python equality says the values are equal; list cells
    must refuse outright (the r5 token_ids failure mode)."""
    import decimal

    import numpy as np
    import pytest as _pytest

    from tests.oracle_util import _norm, rowset

    assert _norm(123) != _norm(123.0)
    assert _norm(np.int64(5)) == _norm(5)
    assert _norm(np.float64(5.0)) == _norm(5.0)
    assert _norm(decimal.Decimal("24851.00")) != _norm(24851.0)
    assert rowset(["a"], [(1,)]) != rowset(["a"], [(1.0,)])
    assert rowset(["a", "b"], [(1, 2.5)]) == rowset(["b", "a"], [(2.5, 1)])
    with _pytest.raises(TypeError):
        _norm([1, 2, 3])


def test_r11_review_regressions(spark, tmp_path):
    """Consolidated pins for the r11 batch-3 review fixes — each case
    previously crashed, collided, or silently lost data."""
    import json as _json
    import os

    import pyspark.sql.functions as F

    from labelspark_spark.functions.text import char_ngrams, word_shingles
    from labelspark_spark.operators.flatten import flatten_structs
    from labelspark_spark.operators.silver import object_counts_wide
    from labelspark_spark.operators.uploads import lookup_join, upsert_keys
    from labelspark_spark.sources import python_datasource as pds
    from labelspark_spark.sources.readers import json_literal_to_df

    # json literal: schema UNIONS across records; a null in the first
    # record must not pin the field's type (old: records[0] only)
    df = json_literal_to_df(spark, '[{"a":null},{"a":5,"b":"x"}]')
    assert set(df.columns) == {"a", "b"}
    assert {(r.a, r.b) for r in df.collect()} == {(None, None), (5, "x")}

    # upsert suffix mode: a suffix-form incoming key reconciles inside
    # its family instead of colliding verbatim; in-batch mixed keys
    # never mint duplicates (old: join on the literal key)
    ex = spark.createDataFrame([("k///1",)], ["global_key"])
    inc = spark.createDataFrame([("k///1",)], ["global_key"])
    assert [r.global_key for r in upsert_keys(inc, ex, mode="suffix").collect()] == [
        "k///2"
    ]
    inc2 = spark.createDataFrame([("a", 1), ("a", 2), ("a///1", 3)], ["global_key", "o"])
    ex2 = spark.createDataFrame([], "global_key string")
    out2 = sorted(
        r.global_key for r in upsert_keys(inc2, ex2, mode="suffix", order_by="o").collect()
    )
    assert out2 == ["a", "a///1", "a///2"]

    # lookup_join: duplicate lookup keys resolve deterministically
    # (max, non-null preferred), not by shuffle arrival order
    base = spark.createDataFrame([("dr1", "old")], ["k", "v"])
    lk = spark.createDataFrame([("dr1", "x"), ("dr1", "z"), ("dr1", None)], ["k", "v"])
    assert lookup_join(base, lk, "k", "v", "v", default_col="v").collect()[0].v == "z"

    # flatten_structs: struct field names containing dots resolve via
    # getField, never by parsing a dot-joined path string
    src = spark.sql("select named_struct('Is this O.K.', 1, 'plain', 'y') as Label")
    out = flatten_structs(src)
    assert out.columns == ["Label.Is this O.K.", "Label.plain"]
    assert out.collect()[0][0] == 1

    # silver pivot: a pivoted title equal to a key column name must not
    # produce an ambiguous select
    b = spark.createDataFrame(
        [("k1", [{"title": "DataRowID"}, {"title": "car"}])],
        "DataRowID string, objs array<struct<title:string>>",
    )
    w = object_counts_wide(b, ["DataRowID"], "objs")
    assert sorted(w.columns) == ["DataRowID", "DataRowID.count", "car.count"]

    # shingle builders: NULL text propagates as NULL, never [null]
    t = spark.createDataFrame([(None,), ("ab",)], "t string")
    rows = t.select(
        char_ngrams(F.col("t"), 5).alias("g"), word_shingles(F.col("t"), 3).alias("w")
    ).collect()
    assert rows[0].g is None and rows[0].w is None
    assert rows[1].g == ["ab"] and rows[1].w == ["ab"]

    # python datasource: append MERGES the manifest; overwrite reclaims
    # stale stage files (old: every commit rewrote the manifest with
    # only its own files)
    pds.register(spark)
    d = str(tmp_path / "spool")
    schema = "row_id bigint, page int, label string, score_ppm bigint"
    spark.createDataFrame([(1, 0, "a", 10)], schema).coalesce(1).write.format(
        "labelspark_rest"
    ).option("path", d).mode("append").save()
    spark.createDataFrame([(2, 0, "b", 20)], schema).coalesce(1).write.format(
        "labelspark_rest"
    ).option("path", d).mode("append").save()
    m = _json.load(open(os.path.join(d, "manifest.json")))
    assert m["total_rows"] == 2 and len(m["files"]) == 2
    spark.createDataFrame([(3, 0, "c", 30)], schema).coalesce(1).write.format(
        "labelspark_rest"
    ).option("path", d).mode("overwrite").save()
    m2 = _json.load(open(os.path.join(d, "manifest.json")))
    stage = sorted(f for f in os.listdir(d) if f.startswith("stage-"))
    assert m2["total_rows"] == 1 and stage == sorted(m2["files"])


def test_r12_review_regressions(spark):
    """Pins for defects found by the r12 post-close review batches."""
    from pyspark.sql import functions as F

    # conversion_latency: a user whose purchases ALL precede their
    # first signup is a NON-CONVERTER and must keep a cohort row (old
    # post-filter form dropped every joined row and lost the user;
    # latent on the synthetic data, where signup precedes purchase)
    rows = [
        (1, "signup", "2024-01-10 00:00:00"),
        (1, "purchase", "2024-01-05 00:00:00"),
        (2, "signup", "2024-01-02 00:00:00"),
        (2, "purchase", "2024-01-08 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    s = (
        df.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("s_ts")),
            "left",
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("p_ts").alias("c_ts"))
    )
    got = {r["user_id"]: r["c_ts"] for r in conv.collect()}
    assert set(got) == {1, 2}, "non-converter with pre-signup purchase lost"
    assert got[1] is None and got[2] is not None


def test_asof_join_null_left_ts_and_guard_gaps(spark):
    # r13 ADVICE: (1) a left row with a NULL timestamp is "as of"
    # nothing in BOTH directions — under the old plain desc ordering it
    # sorted nulls-last in direction='forward' and picked up the
    # earliest right row's values; (2) a value_cols entry that names a
    # join key must be refused like any other clash; (3) empty
    # value_cols short-circuits instead of building a zero-field struct.
    from labelspark_spark.operators import asof as asof_ops

    left = spark.createDataFrame([(1, 10), (1, 20), (1, None)], "k long, lts long")
    right = spark.createDataFrame([(1, 15, "x")], "k long, rts long, v1 string")
    fwd = {
        r.lts: r.v1
        for r in asof_ops.asof_join(
            left, right, ["k"], "lts", "rts", direction="forward"
        ).collect()
    }
    assert fwd == {10: "x", 20: None, None: None}
    bwd = {
        r.lts: r.v1 for r in asof_ops.asof_join(left, right, ["k"], "lts", "rts").collect()
    }
    assert bwd == {10: None, 20: "x", None: None}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_ops.asof_join(left, right, ["k"], "lts", "rts", value_cols=["k", "v1"])

    # right side carries only keys + timestamp -> inferred empty
    # value_cols; the join is a no-op that keeps left's rows and schema
    right_bare = right.select("k", "rts")
    out = asof_ops.asof_join(left, right_bare, ["k"], "lts", "rts")
    assert out.columns == ["k", "lts"]
    assert sorted(
        [(r.k, r.lts) for r in out.collect()], key=lambda t: (t[0], t[1] if t[1] is not None else -1)
    ) == [(1, None), (1, 10), (1, 20)]
