"""A/B harness for the word n-gram shingle CONSTRUCTOR — the round-10
diagnosis (PERF.md "ngram_novelty shuffle-key investigation") put the
interpreted ``zip_with``/``transform`` chain at ~15 µs/gram and ~90 %
of the novelty/jaccard/containment family cost. Candidates:

  zipwith   current production form: n-1 interpreted zip_with passes +
            array_distinct (dedup.py:_with_shingles)
  regex     one codegen pass: words -> concat_ws sentence ->
            regexp_extract_all with a zero-width word-start lookahead
            that captures each overlapping n-word window + array_distinct
  posexpl   fully-codegen exploded rows (NO per-doc distinct):
            posexplode(words) carried once, gram = concat_ws(slice)
            after explode of positions
  pandas    Arrow-batched mapInPandas builder emitting per-doc DISTINCT
            (doc_id, gram) rows from one Python pass per batch

Each form is forced to full value computation (sum(xxhash64(gram)) +
count) so Catalyst cannot eliminate construction — the r10 lesson.
``--check`` cross-verifies per-doc distinct gram sets are identical.

Usage: python tools/bench_shingles.py [sf0.1|sf1] [--check]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from bunsen_spark.session import get_spark  # noqa: E402

N = 3


def grams_zipwith(docs: DataFrame) -> DataFrame:
    from bunsen_spark.operators.dedup import _with_shingles

    return _with_shingles(docs, N).select(
        "doc_id", F.explode("shingles").alias("gram")
    )


def grams_regex(docs: DataFrame) -> DataFrame:
    words = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    pat = r"\\b(?=([a-z0-9]+" + r" [a-z0-9]+" * (N - 1) + r"))"
    sh = (
        f"array_distinct(CASE WHEN size({words}) < {N}"
        f" THEN array(concat_ws(' ', {words}))"
        f" ELSE regexp_extract_all(concat_ws(' ', {words}), '{pat}', 1) END)"
    )
    return docs.select("doc_id", F.explode(F.expr(sh)).alias("gram"))


def grams_posexpl(docs: DataFrame) -> DataFrame:
    words = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    base = docs.select("doc_id", F.expr(words).alias("__w"))
    return base.select(
        "doc_id",
        F.expr(f"explode(sequence(1, greatest(size(__w) - {N - 1}, 1)))").alias(
            "__i"
        ),
        "__w",
    ).select(
        "doc_id", F.expr(f"concat_ws(' ', slice(__w, __i, {N}))").alias("gram")
    )


def grams_pandas(docs: DataFrame) -> DataFrame:
    import re

    def build(batches):
        import pandas as pd

        tok = re.compile(r"[a-z0-9]+")
        for pdf in batches:
            ids, grams = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = tok.findall(text.lower())
                if len(w) < N:
                    g = [" ".join(w)]
                else:
                    g = list(
                        dict.fromkeys(
                            " ".join(w[i : i + N])
                            for i in range(len(w) - N + 1)
                        )
                    )
                ids.extend([doc_id] * len(g))
                grams.extend(g)
            yield pd.DataFrame({"doc_id": ids, "gram": grams})

    return docs.select("doc_id", "text").mapInPandas(
        build, "doc_id long, gram string"
    )


FORMS = {
    "zipwith": grams_zipwith,
    "regex": grams_regex,
    "posexpl": grams_posexpl,
    "pandas": grams_pandas,
}


def force(df: DataFrame):
    # modulo keeps the ANSI-mode sum from overflowing at sf1+ while
    # still forcing every gram string to be materialized and hashed
    return df.agg(
        F.sum(F.xxhash64("gram") % 1000003).alias("h"),
        F.count(F.lit(1)).alias("c"),
    ).collect()[0]


def main() -> None:
    sf = next((a for a in sys.argv[1:] if not a.startswith("--")), "sf0.1")
    base = REPO / "scale_testdata" / sf
    path = (
        base / "documents.parquet"
        if base.exists()
        else Path("/root/testdata") / sf / "documents.parquet"
    )
    spark = get_spark("bench-shingles")
    docs = spark.read.parquet(str(path))

    if "--check" in sys.argv:
        ref = FORMS["zipwith"](docs).distinct()
        for name in ("regex", "pandas", "posexpl"):
            got = FORMS[name](docs).distinct()
            diff = ref.exceptAll(got).count() + got.exceptAll(ref).count()
            print(f"check {name}: distinct-set diff = {diff}")
        return

    for name, fn in FORMS.items():
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            row = force(fn(docs))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(
            f"{name:8s} median {ts[1]:6.2f}s  (min {ts[0]:.2f})"
            f"  rows={row['c']:,}  h={row['h']}"
        )


if __name__ == "__main__":
    main()
