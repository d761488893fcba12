"""Engine facade: parse -> plan -> top-k, plus TREC-format output.

Top-k uses the reference's deterministic sort rule — score desc, external id
(url) asc (ScoreList.java:90-105) — executed as Spark's
TakeOrderedAndProject (orderBy + limit), which does per-partition heaps and
a driver merge: exactly the distributed top-k you want at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index.build import IndexReader
from .query.models import make_model
from .query.parser import QueryParser
from .query.planner import Planner


class Engine:
    def __init__(self, reader: IndexReader):
        self.reader = reader

    def search(self, query: str, model: str = "bm25", k: int = 100, **model_kw) -> DataFrame:
        """Returns (url, score) top-k, reference sort rule."""
        m = make_model(model, **model_kw)
        root = QueryParser(m.name).parse(query)
        if root is None:  # all stopwords
            return self.reader.docid_url_map().select("url", F.lit(0.0).alias("score")).limit(0)
        scores = Planner(self.reader, m).plan(root)
        urls = self.reader.docid_url_map()
        return (
            scores.join(urls, "docid")
            .select("url", "score")
            .orderBy(F.desc("score"), F.asc("url"))
            .limit(k)
        )

    def search_batch(self, queries: dict[str, str], model: str = "bm25",
                     k: int = 100, **model_kw) -> dict[str, list[tuple[str, float]]]:
        return {
            qid: [(r["url"], r["score"]) for r in self.search(q, model, k, **model_kw).collect()]
            for qid, q in queries.items()
        }

    @staticmethod
    def trec_lines(qid: str, ranking: list[tuple[str, float]], run_id: str = "run") -> list[str]:
        """TREC output: 'qid Q0 extid rank score runid'; dummy row when empty
        (QryEval.java:1442-1467)."""
        if not ranking:
            return [f"{qid} Q0 dummy 1 0 {run_id}"]
        return [
            f"{qid} Q0 {url} {i + 1} {score} {run_id}"
            for i, (url, score) in enumerate(ranking)
        ]
