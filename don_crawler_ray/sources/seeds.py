"""Seed-list loading, merging, and frontier expansion.

Reference parity:
- ``LoadPublishers`` (``common/publisher.go:22-36``, S1): YAML seed
  file -> publisher rows. Seed lists are tiny -> parsed driver-side,
  exposed as ``ray.data.from_items`` / Arrow.
- publishers.yml writer (``cmd/download_publishers.go:86-100``, S4).
- Upsert/merge by id (``cmd/download_publishers.go:63-84``, J1):
  update org URL when the id matches, append when absent.
- ``ScanPublisher`` platform dispatch (``crawler/crawler.go:199-255``,
  M1): unsupported-scheme seeds become error rows instead of crashing;
  supported seeds select their host's frontier rows (the sandbox analog
  of enumerating an org's repositories).
"""

from __future__ import annotations

import pyarrow as pa

from don_crawler_ray.functions.urlnorm import url_host

SUPPORTED_SCHEMES = ("http", "https")


def load_publishers_yaml(path: str) -> list[dict]:
    """Parse a publishers YAML file into seed dicts (S1)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or []
    out = []
    for row in raw:
        out.append(
            {
                "id": str(row.get("id", "")),
                "name": str(row.get("name", "")),
                "org_url": str(row.get("organization", row.get("org_url", "")) or ""),
                "repo_urls": [str(u) for u in (row.get("repositories") or row.get("repo_urls") or [])],
                "organisation_url": row.get("organisation-url") or row.get("organisation_url"),
            }
        )
    return out


def merge_publishers(base: list[dict], updates: list[dict]) -> list[dict]:
    """J1 upsert semantics (``cmd/download_publishers.go:63-84``):
    for each update row, if an existing row has the same id, update its
    org URL in place; otherwise append. Order: base order preserved,
    new rows appended in update order."""
    merged = [dict(r) for r in base]
    index = {r["id"]: i for i, r in enumerate(merged)}
    for upd in updates:
        i = index.get(upd["id"])
        if i is not None:
            merged[i]["org_url"] = upd["org_url"] or merged[i]["org_url"]
            if upd.get("name"):
                merged[i]["name"] = upd["name"]
        else:
            index[upd["id"]] = len(merged)
            merged.append(dict(upd))
    return merged


def write_publishers_yaml(path: str, publishers: list[dict]) -> None:
    """S4: dump the merged list back to YAML (driver-side, tiny)."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(publishers, f, sort_keys=False)


def classify_seeds(publishers: list[dict]) -> tuple[dict[str, str], list[dict]]:
    """M1 platform dispatch: map supported seeds to their host
    (``host -> publisher id``) and collect error rows for unsupported
    schemes (``crawler/crawler.go:213-219`` emits errors, continues)."""
    host_to_pub: dict[str, str] = {}
    errors: list[dict] = []
    for p in publishers:
        url = p.get("org_url") or ""
        scheme = url.split("://", 1)[0].lower() if "://" in url else ""
        if scheme not in SUPPORTED_SCHEMES:
            errors.append({"id": p["id"], "org_url": url, "error": f"unsupported scheme: {scheme or 'none'}"})
            continue
        host = url_host(url)
        if host:
            host_to_pub[host] = p["id"]
        for extra in p.get("repo_urls") or []:
            h = url_host(extra)
            if h:
                host_to_pub.setdefault(h, p["id"])
    return host_to_pub, errors


def seed_filter_stage(host_to_pub: dict[str, str]):
    """map_batches kernel: keep frontier rows whose host belongs to a
    seed publisher; attach ``publisher_id`` (the ScanGroupOfRepos
    analog — publisher expansion as a broadcast membership filter,
    never a shuffle)."""

    def _filter(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # per-DISTINCT-host lookup only (hosts repeat heavily)
        enc = pc.dictionary_encode(batch.column("host").combine_chunks())
        host_dict = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        pubs = [host_to_pub.get(h) for h in host_dict]
        keep_by_code = np.fromiter((p is not None for p in pubs), bool, len(pubs))
        keep = keep_by_code[codes] if len(codes) else np.zeros(0, bool)
        out = batch.filter(pa.array(keep))
        kept_codes = codes[keep]
        pub_col = pc.cast(
            pa.DictionaryArray.from_arrays(
                pa.array(kept_codes.astype(np.int32)),
                pa.array([p or "" for p in pubs], pa.string()),
            ),
            pa.string(),
        )
        return out.append_column("publisher_id", pub_col)

    return _filter
