"""Index inspection — the InspectIndex analog
(/root/reference/QryEval/InspectIndex.java:152-667): dump corpus stats, the
term dictionary, a term's posting list, and a document's term vector. All
are DESCRIBE/SELECT-style DataFrame reads over the index tables."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index.build import IndexReader
from .query.postings import decode_postings


def corpus_stats(reader: IndexReader) -> dict:
    """listStats analog (InspectIndex.java:286-333)."""
    out = {"num_docs": reader.n_docs, "fields": {}}
    for f, (c, s) in reader.field_stats.items():
        out["fields"][f] = {
            "doc_count": c, "sum_field_lens": s,
            "avg_doclen": (s / c if c else 0.0),
        }
    return out


def term_dictionary(reader: IndexReader, field: str = "body",
                    prefix: str | None = None, limit: int = 100) -> DataFrame:
    """listTermDict analog: (term, df, ctf) sorted by term."""
    ts = reader._term_stats.filter(F.col("field") == field)
    if prefix:
        ts = ts.filter(F.col("term").startswith(prefix))
    return ts.select("term", "df", "ctf").orderBy("term").limit(limit)


def postings_for(reader: IndexReader, term: str, field: str = "body",
                 with_positions: bool = True) -> DataFrame:
    """listPostings analog: decoded posting list joined to external ids."""
    p = decode_postings(reader.blocks_for([(field, term)]), with_positions)
    return p.join(reader.docid_url_map(), "docid").orderBy("docid")


def doc_vector(reader: IndexReader, url: str, field: str = "body") -> DataFrame:
    """listDocVector analog (TermVector view): (term, tf, positions)."""
    from .corpus import positions_col

    ids = reader.docid_url_map().filter(F.col("url") == url)
    return (
        reader.doc_terms()
        .filter(F.col("field") == field)
        .join(ids, "docid")
        .select("term", "tf", positions_col("positions_z").alias("positions"))
        .orderBy("term")
    )
