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
    out = {"num_docs": reader.n_docs, "stemmer": reader.stemmer, "fields": {}}
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
    with_positions = with_positions and getattr(reader, "store_positions", True)
    p = decode_postings(reader.blocks_for([(field, term)]), with_positions,
                        payload_codec=reader.payload_codec,
                        norms_dir=reader.norms_dir,
                        salt_range=reader.salt_range)
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


def external_docid(reader: IndexReader, docid: int) -> str | None:
    """-list-edocid analog (InspectIndex.java:190-203): internal -> external."""
    rows = reader.docid_url_map().filter(F.col("docid") == int(docid)).collect()
    return rows[0]["url"] if rows else None


def internal_docid(reader: IndexReader, url: str) -> int | None:
    """-list-idocid analog (InspectIndex.java:205-214): external -> internal."""
    rows = reader.docid_url_map().filter(F.col("url") == url).collect()
    return int(rows[0]["docid"]) if rows else None


def list_docids(reader: IndexReader, limit: int = 100) -> DataFrame:
    """-list-docids analog (InspectIndex.java:228-236)."""
    return reader.docid_url_map().select("docid", "url").orderBy("docid").limit(limit)


def list_fields(reader: IndexReader) -> list[str]:
    """-list-fields analog (InspectIndex.java:238-252)."""
    return sorted(reader.field_stats)


def doc_metadata(reader: IndexReader, docid: int) -> dict:
    """-list-metadata / -list-doc analog (InspectIndex.java:217-263): the
    engine stores url + crawl attrs + per-field lengths, not raw text (the
    forward table keeps postings; raw html stays in the source lake)."""
    rows = reader.attrs().filter(F.col("docid") == int(docid)).collect()
    if not rows:
        return {}
    out = dict(rows[0].asDict())
    lens = reader.doc_lens().filter(F.col("docid") == int(docid)).collect()
    out["field_lens"] = {r["field"]: int(r["len"]) for r in lens}
    return out


def postings_sample(reader: IndexReader, term: str, field: str = "body",
                    n: int = 5) -> DataFrame:
    """-list-postings-sample analog (InspectIndex.java:276-283)."""
    return postings_for(reader, term, field).limit(n)


def doc_vector_all(reader: IndexReader, url: str) -> DataFrame:
    """-list-termvector analog (all fields; InspectIndex.java:345-352)."""
    from .corpus import positions_col

    ids = reader.docid_url_map().filter(F.col("url") == url)
    return (
        reader.doc_terms()
        .join(ids, "docid")
        .select("field", "term", "tf", positions_col("positions_z").alias("positions"))
        .orderBy("field", "term")
    )


def main(argv: list[str]) -> int:
    """Flag-compatible CLI (InspectIndex.java:149-368):

        python -m searchengines_spark.inspect -index DIR \
            [-list-stats] [-list-fields] [-list-docids N] [-list-edocid ID]
            [-list-idocid URL] [-list-doc ID] [-list-metadata ID]
            [-list-terms FIELD]
            [-list-postings TERM FIELD] [-list-postings-sample TERM FIELD]
            [-list-termvector URL] [-list-termvector-field URL FIELD]
            [-list-snapshots] [-snapshot N]

    ``-snapshot N`` (before other flags) opens the index as of commit N
    (time travel); ``-list-snapshots`` dumps the snapshot log.
    """
    import json as _json

    from .session import get_spark

    i, reader = 0, None
    spark, index_dir, snap = None, None, None
    while i < len(argv):
        a = argv[i]
        if a == "-snapshot":
            snap = int(argv[i + 1]); i += 2
            if index_dir is not None:
                reader = IndexReader(spark, index_dir, snapshot=snap)
            continue
        if a == "-index":
            spark = spark or get_spark("inspect", cores=8, shuffle_partitions=8)
            index_dir = argv[i + 1]
            reader = IndexReader(spark, index_dir, snapshot=snap); i += 2; continue
        if a == "-list-snapshots":
            from .index.snapshots import list_snapshots

            if index_dir is None:
                print("specify -index DIR first"); return 2
            print(_json.dumps(list_snapshots(index_dir), indent=2)); i += 1
            continue
        if reader is None:
            print("specify -index DIR first"); return 2
        if a == "-list-stats":
            print(_json.dumps(corpus_stats(reader), indent=2)); i += 1
        elif a == "-list-fields":
            print("\n".join(list_fields(reader))); i += 1
        elif a == "-list-docids":
            list_docids(reader, int(argv[i + 1])).show(int(argv[i + 1]), False); i += 2
        elif a == "-list-edocid":
            print(external_docid(reader, int(argv[i + 1]))); i += 2
        elif a == "-list-idocid":
            print(internal_docid(reader, argv[i + 1])); i += 2
        elif a == "-list-doc":
            # listDoc (InspectIndex.java:381-390): "Document: docid N" +
            # the stored fields. The engine stores url/attrs/field lens,
            # not raw text (raw html stays in the source lake).
            did = int(argv[i + 1])
            print(f"\nDocument:  docid {did}")
            print(_json.dumps(doc_metadata(reader, did), indent=2)); i += 2
        elif a == "-list-metadata":
            print(_json.dumps(doc_metadata(reader, int(argv[i + 1])), indent=2)); i += 2
        elif a == "-list-terms":
            term_dictionary(reader, argv[i + 1]).show(100, False); i += 2
        elif a == "-list-postings":
            postings_for(reader, argv[i + 1], argv[i + 2]).show(100, False); i += 3
        elif a == "-list-postings-sample":
            postings_sample(reader, argv[i + 1], argv[i + 2]).show(5, False); i += 3
        elif a == "-list-termvector":
            doc_vector_all(reader, argv[i + 1]).show(200, False); i += 2
        elif a == "-list-termvector-field":
            doc_vector(reader, argv[i + 1], argv[i + 2]).show(200, False); i += 3
        else:
            print(f"Warning: unknown argument {a}"); i += 1
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys as _sys

    raise SystemExit(main(_sys.argv[1:]))
