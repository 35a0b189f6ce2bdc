"""CLI entry points — `python -m don_crawler_ray <cmd>`.

Mirrors the reference's cobra subcommands (``cmd/root.go:10-29``):
``crawl`` (the main pipeline, ``cmd/crawl.go``), ``crawl-software``
(single URL, ``cmd/crawl-software.go``), ``download-publishers``
(seed merge, ``cmd/download_publishers.go``), plus ``gen-frontier``
for the deterministic synthetic input. Designed to run under
``ray job submit -- python -m don_crawler_ray crawl ...`` on a cluster;
standalone it initialises a local Ray session itself (guarded — the
library never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)


def cmd_crawl(args) -> int:
    from don_crawler_ray.config import load_config
    from don_crawler_ray.pipelines.crawl import run_crawl
    from don_crawler_ray.stages.schedule import PolitenessConfig

    if not args.out:
        # Viper-style default (main.go:23-38): DATADIR from env /
        # config file / built-in default
        import os

        args.out = os.path.join(str(load_config()["DATADIR"]), "crawl")
    _ensure_ray(args.num_cpus)
    politeness = None
    if args.politeness:
        import pyarrow.parquet as pq

        politeness = PolitenessConfig.from_table(pq.read_table(args.politeness))
    counters = run_crawl(
        args.frontier,
        args.out,
        politeness,
        n_salts=args.salts,
        n_seen_shards=args.seen_shards,
        max_rounds=args.max_rounds,
        resume=args.resume,
        seen_restore_dir=args.seen_restore,
    )
    if args.warc_out:
        from don_crawler_ray.sources.warc import export_crawl_warc

        export_crawl_warc(args.out, args.warc_out)
        counters["warc_out"] = args.warc_out
    print(json.dumps(counters, sort_keys=True))
    return 0


def cmd_crawl_software(args) -> int:
    from don_crawler_ray.pipelines.crawl import crawl_single_url

    if args.transport == "store":
        if not args.frontier:
            print("error: --frontier is required with --transport store", file=sys.stderr)
            return 2
        _ensure_ray(args.num_cpus)  # the live path never touches the page store
    out = crawl_single_url(
        args.url, args.frontier, transport=args.transport, timeout_s=args.timeout
    )
    print(json.dumps(out.to_pylist()[0], default=str))
    return 0


def cmd_download_publishers(args) -> int:
    from don_crawler_ray.sources.seeds import (
        load_publishers_yaml,
        merge_publishers,
        write_publishers_yaml,
    )

    base = load_publishers_yaml(args.dest) if args.dest and args.base_exists else []
    updates = load_publishers_yaml(args.src)
    merged = merge_publishers(base, updates)
    write_publishers_yaml(args.dest, merged)
    print(f"wrote {len(merged)} publishers to {args.dest}")
    return 0


def cmd_gen_frontier(args) -> int:
    if args.from_sitemap:
        # real-seed path: sitemap XML (urlset / sitemapindex) -> the
        # frontier schema, written as one parquet the crawl can take
        import pyarrow as pa
        import pyarrow.parquet as pq

        from don_crawler_ray.sources.sitemap import (
            read_sitemap,
            sitemap_to_frontier_rows,
        )

        _ensure_ray(args.num_cpus)
        ds = read_sitemap(args.from_sitemap).map_batches(
            sitemap_to_frontier_rows, batch_format="pyarrow"
        )
        # explicit frontier schema: an inferred-schema write of zero
        # rows would produce a zero-column parquet the crawl read then
        # chokes on, and non-empty types would be inference-dependent
        frontier_schema = pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        )
        rows = ds.take_all()
        if not rows:
            print(
                "error: sitemap yielded zero url rows — a sitemapindex "
                "only lists child sitemaps (kind='sitemap'); fetch the "
                "children and pass them to --from-sitemap instead",
                file=sys.stderr,
            )
            return 2
        pq.write_table(pa.Table.from_pylist(rows, schema=frontier_schema), args.out)
        print(args.out)
        return 0

    from don_crawler_ray.sources.frontier import generate_frontier_parquet

    if args.rows and args.rows > 100_000:
        _ensure_ray(args.num_cpus)
    path = generate_frontier_parquet(
        args.out, scale=args.scale, seed=args.seed, n_rows=args.rows, n_hosts=args.hosts
    )
    print(path)
    return 0


def cmd_version(args) -> int:
    """``version`` subcommand parity (``cmd/version.go:10-26``)."""
    from don_crawler_ray import __version__

    print(f"Version:\t {__version__}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="don_crawler_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="checkpointed frontier crawl")
    c.add_argument("--frontier", required=True)
    c.add_argument("--out", default=None, help="output dir (default: $DATADIR/crawl)")
    c.add_argument("--politeness", help="politeness parquet (host budgets + robots)")
    c.add_argument("--salts", type=int, default=8)
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--max-rounds", type=int, default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--seen-restore", default=None, help="seen dir of a prior run (incremental)")
    c.add_argument("--warc-out", default=None, help="also export the output as WARC/1.0 archives")
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("crawl-software", help="single-URL crawl")
    s.add_argument("url")
    s.add_argument("--frontier", default=None, help="page store (required with --transport store)")
    s.add_argument(
        "--transport",
        choices=["store", "http"],
        default="store",
        help="store = page-store lookup (default); http = live GET with the reference retry loop",
    )
    s.add_argument("--timeout", type=float, default=10.0, help="live-transport deadline (seconds)")
    s.set_defaults(fn=cmd_crawl_software)

    d = sub.add_parser("download-publishers", help="merge publisher seed lists")
    d.add_argument("--src", required=True)
    d.add_argument("--dest", required=True)
    d.add_argument("--base-exists", action="store_true")
    d.set_defaults(fn=cmd_download_publishers)

    g = sub.add_parser("gen-frontier", help="deterministic synthetic frontier")
    g.add_argument("--out", required=True)
    g.add_argument("--scale", default=None)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--rows", type=int, default=None)
    g.add_argument("--hosts", type=int, default=None)
    g.add_argument(
        "--from-sitemap", nargs="+", default=None,
        help="build the frontier from sitemap XML files instead of synthesizing",
    )
    g.set_defaults(fn=cmd_gen_frontier)

    v = sub.add_parser("version", help="print the engine version")
    v.set_defaults(fn=cmd_version)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
