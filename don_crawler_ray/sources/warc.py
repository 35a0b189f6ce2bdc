"""WARC/1.0 sink + source — the native archive format of web crawls
(ISO 28500; the format don-crawler-class engines would emit for raw
page payloads, and the format Common-Crawl-style corpora arrive in).

Pure-Python, deterministic, streaming both ways:

- ``WarcDatasink``: a Ray Data ``Datasink`` — each write task turns
  its blocks into one ``part-{task_idx:06d}.warc`` file of
  ``response`` records (one per row). Record IDs are deterministic
  (md5 of the target URI formatted as ``urn:uuid:``), so re-running
  the same write produces byte-identical record bodies — only the
  task->file grouping depends on parallelism, which is the resumable
  partitioned-output contract the parquet sinks follow too.
- ``WarcDatasource``: a ``FileBasedDatasource`` — streams records
  back out of each file as Arrow batches of
  ``(target_uri, warc_date, payload)``; one pass, no full-file
  string split (records are walked header-block by header-block via
  Content-Length, so payloads containing blank lines round-trip).

Only row payloads ride through the object store; headers are
reconstructed per record. At 100 TB the write fans out one file per
task exactly like the parquet sink, and the read parallelizes per
file with Ray's standard file-splitting metadata.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING, Iterable, Iterator, List, Union

import pyarrow as pa

if TYPE_CHECKING:
    import pandas as pd

_CRLF = "\r\n"


def _record_id(uri: str) -> str:
    h = hashlib.md5(uri.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def record_bytes(target_uri: str, warc_date: str, payload: str) -> bytes:
    """One WARC/1.0 ``response`` record, deterministic bytes."""
    body = payload.encode("utf-8")
    head = (
        "WARC/1.0" + _CRLF
        + "WARC-Type: response" + _CRLF
        + f"WARC-Record-ID: {_record_id(target_uri)}" + _CRLF
        + f"WARC-Date: {warc_date}" + _CRLF
        + f"WARC-Target-URI: {target_uri}" + _CRLF
        + "Content-Type: text/plain" + _CRLF
        + f"Content-Length: {len(body)}" + _CRLF
        + _CRLF
    )
    return head.encode("utf-8") + body + _CRLF.encode() * 2


def batch_to_warc_bytes(
    batch: pa.Table,
    uri_col: str = "target_uri",
    date_col: str = "warc_date",
    payload_col: str = "payload",
) -> bytes:
    parts = [
        record_bytes(u, d, p)
        for u, d, p in zip(
            batch.column(uri_col).to_pylist(),
            batch.column(date_col).to_pylist(),
            batch.column(payload_col).to_pylist(),
        )
    ]
    return b"".join(parts)


def parse_warc_stream(data: bytes) -> pa.Table:
    """Parse concatenated WARC/1.0 response records (the inverse of
    ``batch_to_warc_bytes``). Walks header blocks and skips payloads
    by Content-Length, so payload bytes are never scanned for
    delimiters — blank lines inside payloads are safe."""
    uris: list[str] = []
    dates: list[str] = []
    payloads: list[str] = []
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        header = data[pos:head_end].decode("utf-8")
        fields = {}
        for line in header.split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields["content-length"])
        body_start = head_end + 4
        payloads.append(data[body_start : body_start + length].decode("utf-8"))
        uris.append(fields["warc-target-uri"])
        dates.append(fields["warc-date"])
        pos = body_start + length + 4  # payload + two CRLF
    return pa.table(
        {
            "target_uri": pa.array(uris, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "payload": pa.array(payloads, pa.string()),
        }
    )


def _datasink_base():
    from ray.data import Datasink

    return Datasink


class WarcDatasink(_datasink_base()):
    """``ds.write_datasink(WarcDatasink(out_dir))`` — one
    ``part-{task_idx:06d}.warc`` per write task."""

    def __init__(
        self,
        out_dir: str,
        uri_col: str = "target_uri",
        date_col: str = "warc_date",
        payload_col: str = "payload",
    ):
        self.out_dir = out_dir
        self.uri_col, self.date_col, self.payload_col = uri_col, date_col, payload_col

    # --- Datasink interface -------------------------------------------------
    def get_name(self) -> str:
        return "WARC"

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):
        return None

    def on_write_start(self) -> None:
        import os

        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks: Iterable[Union[pa.Table, "pd.DataFrame"]], ctx) -> List[str]:
        import os

        chunks = []
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if block.num_rows:
                chunks.append(
                    batch_to_warc_bytes(
                        block, self.uri_col, self.date_col, self.payload_col
                    )
                )
        if not chunks:
            return []
        path = os.path.join(self.out_dir, f"part-{ctx.task_idx:06d}.warc")
        with open(path, "wb") as f:
            for c in chunks:
                f.write(c)
        return [path]

    def on_write_complete(self, write_result) -> None:
        return None

    def on_write_failed(self, error: Exception) -> None:
        return None


def write_warc(ds, out_dir: str, **cols) -> None:
    ds.write_datasink(WarcDatasink(out_dir, **cols))


def read_warc(paths):
    """``ray.data`` Dataset over WARC files (streams per file)."""
    import ray
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc"]

        def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
            yield parse_warc_stream(f.readall())

    return ray.data.read_datasource(WarcDatasource(paths))
