"""Spark 4 Python DataSource (DSv2): the paginated REST export as a
NATIVE Spark source.

The reference's export path materializes the whole label export on the
driver and fans it back out (labelspark client.py:38-81); its video
path issues one requests.get per row inside a UDF. The idiomatic
Spark-4 shape is a registered Python DataSource whose reader declares
one :class:`InputPartition` PER PAGE — the cursor space is enumerated
up front on the driver (cheap: page numbers only), and every page body
is fetched and decoded ON AN EXECUTOR. At 100 TB-scale exports the
page fan-out is the whole ballgame: 10k pages = 10k parallel tasks,
zero driver memory, retries per-task for free.

The payload here is the deterministic synthetic feed the driver
contract can oracle-check (md5-derived fields, exactly reproducible in
DuckDB); a real deployment swaps ``_page_rows`` for an HTTP fetch
through the same partition structure (the ``Transport.fetch_frames``
boundary in client.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def _h60(s: str) -> int:
    """60-bit md5 hash — identical to operators.dedup._hash60 and to the
    DuckDB expression ('0x' || substring(md5(s), 1, 15))::UBIGINT."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _page_rows(page: int, page_size: int, seed: str) -> Iterator[tuple]:
    """One page of the synthetic export: (row_id, page, label, score_ppm),
    every field a pure function of (seed, row_id)."""
    for i in range(page_size):
        row_id = page * page_size + i
        h = _h60(f"{seed}:{row_id}")
        yield (row_id, page, f"class_{h % 7}", h % 1000000)


class PageInputPartition(InputPartition):
    def __init__(self, page: int, page_size: int, seed: str) -> None:
        self.page = page
        self.page_size = page_size
        self.seed = seed


class RestExportReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", 8))
        self.page_size = int(options.get("page_size", 125))
        self.seed = options.get("seed", "export")

    def partitions(self) -> list[InputPartition]:
        # one partition per page: pagination IS the parallelism
        return [
            PageInputPartition(p, self.page_size, self.seed)
            for p in range(self.pages)
        ]

    def read(self, partition: PageInputPartition) -> Iterator[tuple]:
        # runs on an executor; a real connector performs the HTTP GET for
        # exactly this page here
        return _page_rows(partition.page, partition.page_size, partition.seed)


class RestExportStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the export feed: the OFFSET is the page
    cursor, one page per micro-batch. ``read`` returns the next page
    and advances the offset; once the cursor reaches ``pages`` it
    returns empty WITHOUT advancing, which is how the source reports
    'caught up' (processAllAvailable then terminates). Replays between
    committed offsets (``readBetweenOffsets``) re-derive pages purely
    from the cursor — exactly-once on restart for free because the
    payload is a deterministic function of the offset, the property a
    real cursor-paginated API gives you via its page tokens."""

    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", 8))
        self.page_size = int(options.get("page_size", 125))
        self.seed = options.get("seed", "export")

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        # rows are returned as iter(list): the simple-reader protocol
        # needs a true iterator (its caught-up check calls next()) AND
        # pickles the prefetched batch into the planned partition — a
        # generator fails 'cannot pickle generator', while a list
        # iterator satisfies both; a page is bounded by page_size, so
        # materializing is the per-batch memory contract anyway
        p = int(start["page"])
        if p >= self.pages:
            return iter([]), {"page": p}
        return iter(list(_page_rows(p, self.page_size, self.seed))), {"page": p + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                row
                for p in range(int(start["page"]), int(end["page"]))
                for row in _page_rows(p, self.page_size, self.seed)
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class SpoolCommitMessage(WriterCommitMessage):
    def __init__(self, file: str, rows: int) -> None:
        self.file = file
        self.rows = rows


class RestSpoolWriter(DataSourceWriter):
    """DSv2 write path with the REAL two-phase commit protocol the
    reference's driver-side upload loop lacks (uploader.py:93 collects
    everything, then posts): each TASK spools its partition as a staged
    ndjson file and returns a commit message; the DRIVER commit writes
    a manifest naming exactly the committed files, and abort deletes
    the stage — readers treat the manifest as the source of truth, so a
    failed/speculated task can never leak half-written output. On a
    cluster the path must be shared storage (or each stage an HTTP
    batch POST with the manifest a final marker call)."""

    def __init__(self, options: dict, overwrite: bool = False) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> SpoolCommitMessage:
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"stage-{uuid.uuid4().hex}.ndjson"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return SpoolCommitMessage(name, n)

    def commit(self, messages) -> None:
        import json as _json
        import os

        files = sorted(m.file for m in messages if m is not None)
        rows = sum(m.rows for m in messages if m is not None)
        mpath = os.path.join(self.path, "manifest.json")
        if self.overwrite:
            # drop stage files from prior commits: the manifest is the
            # source of truth, but leaked stages are disk the next
            # overwrite never reclaims (r11 review)
            for name in os.listdir(self.path):
                if (
                    name.startswith("stage-")
                    and name.endswith(".ndjson")
                    and name not in files
                ):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass
        elif os.path.exists(mpath):
            # append MERGES with the prior manifest — the old
            # unconditional rewrite erased every earlier batch from the
            # manifest-driven read-back (r11 review)
            with open(mpath) as f:
                prev = _json.load(f)
            files = sorted(set(prev.get("files", [])) | set(files))
            rows += int(prev.get("total_rows", 0))
        manifest = {"files": files, "total_rows": rows}
        with open(mpath, "w") as f:
            _json.dump(manifest, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


class RestExportDataSource(DataSource):
    """``spark.read.format("labelspark_rest")`` (batch) or
    ``spark.readStream.format("labelspark_rest")`` (one page per
    micro-batch), and ``df.write.format("labelspark_rest")`` (staged
    ndjson spool + manifest commit), after registration via
    ``spark.dataSource.register(RestExportDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "labelspark_rest"

    def schema(self) -> str:
        return "row_id bigint, page int, label string, score_ppm bigint"

    def reader(self, schema) -> RestExportReader:
        return RestExportReader(self.options)

    def simpleStreamReader(self, schema) -> RestExportStreamReader:
        return RestExportStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> RestSpoolWriter:
        return RestSpoolWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the entry)."""
    spark.dataSource.register(RestExportDataSource)
