"""Source connectors: external file formats -> the canonical ``pages``
table (url, warc_ts, html, text, lang) from BASELINE.json's input_hint."""

from .warc import read_warc, read_wet, write_warc, write_wet  # noqa: F401
