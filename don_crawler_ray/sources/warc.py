"""WARC/1.0 sink + source — the native archive format of web crawls
(ISO 28500; the format don-crawler-class engines would emit for raw
page payloads, and the format Common-Crawl-style corpora arrive in).

Pure-Python, deterministic, streaming both ways:

- ``WarcDatasink``: a Ray Data ``Datasink`` — each write task turns
  its blocks into one ``part-{task_idx:06d}.warc`` file of
  ``resource`` records (one per row; the payload is extracted text,
  so ``resource`` + ``text/plain`` is the ISO 28500-valid pairing —
  the reader also accepts foreign ``response`` records). Record IDs
  are deterministic
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


def _check_header_value(name: str, value: str) -> str:
    """Header values must not contain CR/LF — a newline in a URI or
    date would inject header lines and silently truncate the value on
    round-trip. Fail loudly instead (payloads are exempt: they travel
    under Content-Length and may contain anything)."""
    if value is None:
        raise ValueError(f"WARC {name} is null")
    if "\r" in value or "\n" in value:
        raise ValueError(f"WARC {name} contains CR/LF: {value!r}")
    return value


_HDR_PREFIX = "X-Hdr-"  # extension-field carrier for the headers map
_HDR_NAME_OK = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_."
)


def _check_header_name(name: str) -> str:
    """Carried header KEYS must be WARC field-name tokens (letters,
    digits, ``-_.``) — anything else would corrupt the header block."""
    if not name or not set(name) <= _HDR_NAME_OK:
        raise ValueError(f"WARC carried header name is not token-safe: {name!r}")
    return name


def record_bytes(
    target_uri: str,
    warc_date: str,
    payload: str,
    headers: dict[str, str] | None = None,
) -> bytes:
    """One WARC/1.0 ``resource`` record, deterministic bytes.

    ``resource`` (not ``response``) because the payload is extracted
    text, not captured HTTP protocol bytes — per ISO 28500 a resource
    record's Content-Type is the resource's own type, so
    ``text/plain`` is profile-valid here (a ``response`` record would
    require ``application/http; msgtype=response``). ``warc_date``
    must be an ISO-8601 UTC string (``YYYY-MM-DDThh:mm:ssZ``) for
    external WARC tooling; see ``export_crawl_warc``.

    ``headers`` (the reference's ``Headers map[string]string``,
    ``common/repository.go:21``) ride as ``X-Hdr-<key>`` extension
    fields, sorted by key for determinism. Keys round-trip LOWERCASED
    (WARC/HTTP field names are case-insensitive and the parser folds
    them); values must be CR/LF-free like every header value."""
    target_uri = _check_header_value("target_uri", target_uri)
    warc_date = _check_header_value("warc_date", warc_date)
    if payload is None:
        raise ValueError(f"WARC payload is null (uri={target_uri!r})")
    body = payload.encode("utf-8")
    extra = ""
    for k in sorted(headers or {}):
        name = _check_header_name(k).lower()
        val = _check_header_value(f"header {k!r}", headers[k])
        extra += f"{_HDR_PREFIX}{name}: {val}" + _CRLF
    head = (
        "WARC/1.0" + _CRLF
        + "WARC-Type: resource" + _CRLF
        + f"WARC-Record-ID: {_record_id(target_uri)}" + _CRLF
        + f"WARC-Date: {warc_date}" + _CRLF
        + f"WARC-Target-URI: {target_uri}" + _CRLF
        + extra
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
    headers_col: str = "headers",
) -> bytes:
    """Blocks with a ``headers`` column (Arrow ``map<string,string>``)
    carry it through; blocks without one write plain records."""
    if headers_col in batch.column_names:
        # map array -> list of [(k, v), ...] per row (None for null)
        hdrs = [dict(h) if h else None for h in batch.column(headers_col).to_pylist()]
    else:
        hdrs = [None] * batch.num_rows
    parts = [
        record_bytes(u, d, p, h)
        for u, d, p, h in zip(
            batch.column(uri_col).to_pylist(),
            batch.column(date_col).to_pylist(),
            batch.column(payload_col).to_pylist(),
            hdrs,
        )
    ]
    return b"".join(parts)


def iter_warc_records(chunks: Iterable[bytes]) -> Iterator[tuple[dict, bytes]]:
    """Incrementally walk WARC/1.0 records out of a chunk stream,
    yielding ``(header_fields, payload_bytes)`` per complete record.
    Payloads are skipped by Content-Length, never delimiter-scanned,
    so blank lines / WARC banners inside payloads are safe; memory is
    bounded by one record + one chunk, not the file. Truncated input
    raises ValueError naming what was cut; a record without
    Content-Length (mandatory in WARC/1.0) is a format error."""
    buf = bytearray()
    it = iter(chunks)
    eof = False
    pos = 0
    while True:
        head_end = buf.find(b"\r\n\r\n", pos)
        while head_end < 0 and not eof:
            try:
                buf += next(it)
            except StopIteration:
                eof = True
            head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            if bytes(buf[pos:]).strip():
                raise ValueError("truncated WARC header block at end of input")
            return
        header = bytes(buf[pos:head_end]).decode("utf-8")
        fields: dict[str, str] = {}
        for line in header.split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError(
                f"WARC record missing Content-Length (headers: {sorted(fields)})"
            )
        length = int(fields["content-length"])
        body_start = head_end + 4
        while len(buf) < body_start + length and not eof:
            try:
                buf += next(it)
            except StopIteration:
                eof = True
        if len(buf) < body_start + length:
            raise ValueError(
                f"truncated WARC payload ({len(buf) - body_start} of {length} bytes)"
            )
        yield fields, bytes(buf[body_start : body_start + length])
        pos = body_start + length
        # the 4-byte record separator may straddle a chunk boundary —
        # pull until it is fully visible (or EOF) before skipping it
        while len(buf) < pos + 4 and not eof:
            try:
                buf += next(it)
            except StopIteration:
                eof = True
        if buf[pos : pos + 4] == b"\r\n\r\n":
            pos += 4
        if pos > (8 << 20):  # compact the consumed prefix, amortized
            del buf[:pos]
            pos = 0


def _records_to_table(rows: list[tuple[str, str, str, list]]) -> pa.Table:
    return pa.table(
        {
            "target_uri": pa.array([r[0] for r in rows], pa.string()),
            "warc_date": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.string()),
            "headers": pa.array(
                [r[3] for r in rows], pa.map_(pa.string(), pa.string())
            ),
        }
    )


def _response_rows(records: Iterator[tuple[dict, bytes]]) -> Iterator[tuple[str, str, str, list]]:
    """Filter to payload-bearing (``resource`` — our own sink — or
    ``response`` — foreign crawl archives) records with a target URI;
    ``warcinfo`` / ``request`` / ``metadata`` records are skipped, not
    errors. The 4th element is the carried-headers map (``X-Hdr-*``
    extension fields) as sorted ``(key, value)`` pairs."""
    for fields, payload in records:
        if fields.get("warc-type") not in ("resource", "response"):
            continue
        if "warc-target-uri" not in fields:
            continue
        yield (
            fields["warc-target-uri"],
            fields.get("warc-date", ""),
            payload.decode("utf-8"),
            sorted(
                (k[len(_HDR_PREFIX) :], v)
                for k, v in fields.items()
                if k.startswith(_HDR_PREFIX.lower())
            ),
        )


def parse_warc_stream(data: bytes) -> pa.Table:
    """Parse concatenated WARC/1.0 records from bytes (the inverse of
    ``batch_to_warc_bytes``); non-response records are skipped."""
    return _records_to_table(list(_response_rows(iter_warc_records([data]))))


from ray.data import Datasink  # noqa: E402  (after the pure helpers)


class WarcDatasink(Datasink):
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


_READ_CHUNK = 4 << 20
_READ_BATCH_RECORDS = 4096


def read_warc(paths):
    """``ray.data`` Dataset over WARC files: each file is walked
    record-by-record from bounded chunk reads (memory stays
    O(chunk + record), never the whole file) and surfaced as Arrow
    batches of up to ``_READ_BATCH_RECORDS`` response records."""
    import ray
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc"]

        def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
            def chunks() -> Iterator[bytes]:
                while True:
                    b = f.read(_READ_CHUNK)
                    if not b:
                        return
                    yield bytes(b)

            rows: list[tuple[str, str, str]] = []
            for row in _response_rows(iter_warc_records(chunks())):
                rows.append(row)
                if len(rows) >= _READ_BATCH_RECORDS:
                    yield _records_to_table(rows)
                    rows = []
            if rows:
                yield _records_to_table(rows)

    return ray.data.read_datasource(WarcDatasource(paths))


def export_crawl_warc(crawl_out_dir: str, warc_dir: str) -> None:
    """Stream a finished crawl's output (``round=N/`` parquet
    partitions) into a WARC archive directory — the crawl -> archive
    hand-off as one Dataset chain (columns pruned at the read, one
    archive file per write task; nothing materializes on the
    driver)."""
    import os

    import pyarrow.compute as pc
    import ray

    round_dirs = [
        os.path.join(crawl_out_dir, n)
        for n in sorted(os.listdir(crawl_out_dir))
        if n.startswith("round=")
    ]
    if not round_dirs:
        raise ValueError(f"no round= partitions under {crawl_out_dir}")
    ds = ray.data.read_parquet(round_dirs, columns=["canonical_url", "warc_ts", "text"])

    def to_rec(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "target_uri": pc.cast(batch.column("canonical_url"), pa.string()),
                # WARC/1.0 requires ISO-8601 UTC with 'T'/'Z' — Arrow's
                # default timestamp->string cast is not profile-valid
                "warc_date": pc.strftime(batch.column("warc_ts"), format="%Y-%m-%dT%H:%M:%SZ"),
                "payload": pc.cast(batch.column("text"), pa.string()),
            }
        )

    write_warc(ds.map_batches(to_rec, batch_format="pyarrow"), warc_dir)
