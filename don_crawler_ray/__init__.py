"""don_crawler_ray — Ray-Data-native URL-frontier fetch-and-extract engine.

From-scratch reimplementation of the capabilities of
developer-overheid-nl/don-crawler (reference at /root/reference,
studied read-only) as idiomatic Ray Data pipelines. See README.md and
COVERAGE.md for the operator map.
"""

__version__ = "0.1.0"
