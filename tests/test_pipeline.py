"""Behavioral tests for the corpus-preparation operators (pipeline.py).
Oracle parity at sf0.001 is covered by test_oracle_parity; these pin
edge-case semantics the fixture may not exercise."""

from __future__ import annotations

from pyspark.sql import Row

from inverted_index_using_the_map_reduce_paradigm_spark.operators.pipeline import (
    CHUNK_TOKENS,
    q_dataset_split,
    q_doc_chunking,
)

SF = "/root/testdata/sf0.001"


def test_chunking_boundaries(spark, monkeypatch):
    import inverted_index_using_the_map_reduce_paradigm_spark.operators.pipeline as P

    n = CHUNK_TOKENS
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(n))),
            Row(doc_id=2, text=" ".join(f"w{i}" for i in range(n + 1))),
            Row(doc_id=3, text="a b c"),
            Row(doc_id=4, text="!!! 123 ..."),  # normalizes to empty: no chunks
        ]
    )
    monkeypatch.setattr(P, "table", lambda spark, sf, name: docs)
    rows = q_doc_chunking(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_id)

    # exactly-CHUNK doc -> one full chunk, not a trailing empty one
    assert [r.n_tokens for r in by_doc[1]] == [n]
    # CHUNK+1 -> a full chunk plus a 1-token remainder, ids 0 and 1
    assert [(r.chunk_id, r.n_tokens) for r in by_doc[2]] == [(0, n), (1, 1)]
    # short doc passes through as one chunk
    assert by_doc[3][0].chunk_text == "a b c" and by_doc[3][0].n_tokens == 3
    # empty-after-normalization doc emits nothing
    assert 4 not in by_doc
    # chunks reassemble the original normalized token stream, in order
    reassembled = " ".join(r.chunk_text for r in by_doc[2]).split(" ")
    assert reassembled == [f"w{i}".replace(str(i), "") + "" for i in range(0)] + [
        "w" for _ in range(n + 1)
    ]  # digits are stripped by the normalizer: every token normalizes to "w"
    # and n_tokens sums to the doc's token count
    assert sum(r.n_tokens for r in by_doc[2]) == n + 1


def test_split_is_deterministic_and_proportioned(spark):
    a = (
        q_dataset_split(spark, SF)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        q_dataset_split(spark, SF)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)
    assert set(a.split) == {"train", "val", "test"}
    frac = a.split.value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert frac["val"] > 0.02 and frac["test"] > 0.02


def test_stratified_sample_rates_and_determinism(spark):
    """Observed per-stratum keep rates must track the configured ones
    (multiplicative-hash uniformity), and two runs must agree exactly."""
    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.pipeline import (
        SAMPLE_RATES,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

    fn = load_all()["stratified_sample"].fn
    kept = fn(spark, SF).groupBy("lang").count().collect()
    total = dict(
        table(spark, SF, "documents").groupBy("lang").count().collect()
    )
    for r in kept:
        want = SAMPLE_RATES.get(r["lang"], 10000) / 10000
        got = r["count"] / total[r["lang"]]
        assert abs(got - want) < 0.15, (r["lang"], got, want)
    # determinism: identical row sets across invocations
    a = sorted(t.doc_id for t in fn(spark, SF).select("doc_id").collect())
    b = sorted(t.doc_id for t in fn(spark, SF).select("doc_id").collect())
    assert a == b and len(a) > 0


def test_bench_detail_guard_rules():
    """BENCH_DETAIL.json is the quiet-host reference record; bench.py
    may only replace it from a run whose start conditions are at least
    as good (r8, the mechanical form of 'never overwrite a committed
    idle-start record with a loaded run')."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    committed = {"sf": 0.1, "host_canary_par32_sec": 0.13, "load1_start": 0.2}
    g = bench.detail_guard
    assert g(None, 0.1, 0.5, 9.0) is None  # nothing committed yet
    assert g(committed, 0.1, 0.13, 0.3) is None  # same phase, idle
    assert "slower host" in g(committed, 0.1, 0.2, 0.3)
    assert "loaded start" in g(committed, 0.1, 0.13, 5.0)
    assert "different sf" in g(committed, 0.001, 0.13, 0.3)
    # committed record predates the canary fields: load/sf rules still fire
    old = {"sf": 0.1, "load1_start": 0.2}
    assert g(old, 0.1, 0.5, 0.3) is None
    assert "loaded start" in g(old, 0.1, 0.5, 5.0)
    # the direct check: a JVM slow phase is invisible to the canaries,
    # so a run measuring slower per query than the record is refused
    # even with identical canaries and an idle start
    rec = {**committed, "queries": {"a": 1.0, "b": 1.0}}
    slow = {"a": 2.0, "b": 2.0}
    assert "slower than committed record" in g(rec, 0.1, 0.13, 0.3, slow)
    assert g(rec, 0.1, 0.13, 0.3, {"a": 0.9, "b": 0.9}) is None
    # r9: a STRICTLY faster run replaces the record even on a slower
    # host / loaded start — faster queries under worse conditions is
    # stronger evidence the floor moved
    assert g(rec, 0.1, 9.9, 9.9, {"a": 0.9, "b": 0.9}) is None
    # r9: the comparison runs over the INTERSECTION of query names, so
    # a registry that grew an inherently slow new query can still
    # refresh the record (r8 ADVICE), while a genuinely slow run on
    # the common set is still refused
    assert g(rec, 0.1, 0.13, 0.3, {"a": 0.9, "b": 0.9, "codec": 60.0}) is None
    assert "common" in g(rec, 0.1, 0.13, 0.3, {"a": 2.0, "b": 2.0, "c": 0.1})
    # r10 (r9 ADVICE): ZERO common names means the direct s/query rule
    # can't run — the record must be preserved, not replaced on
    # canary/load checks alone against an incomparable registry
    assert "incomparable" in g(rec, 0.1, 0.13, 0.3, {"x": 0.1, "y": 0.1})


def test_stored_index_caches_rebuild_on_corpus_mutation(spark, tmp_path):
    """Stored-index caches key on (sf_dir, corpus fingerprint): mutating
    the corpus IN PLACE at the same path must rebuild the index, not
    serve the stale one (r8).  Checked for the letter-partitioned
    inverted index and the IVF-PQ code index — the two write-once
    stored paths whose staleness would silently corrupt query results."""
    import shutil
    import time as _time

    import duckdb

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import (
        stored_index_dir,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.similarity import (
        stored_pq_index_dir,
    )

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "mut"
    d.mkdir()
    for t in ("documents", "embeddings"):
        shutil.copy(f"{sf}/{t}.parquet", d / f"{t}.parquet")

    idx1 = stored_index_dir(spark, str(d))
    pq1 = stored_pq_index_dir(spark, str(d))[0]
    assert stored_index_dir(spark, str(d)) == idx1  # cache hit, unchanged

    # mutate both tables in place (same path, new content)
    con = duckdb.connect()
    con.sql(
        f"""COPY (SELECT doc_id, text || ' zmutant' AS text, lang, source,
                   n_chars + 8 AS n_chars
            FROM '{sf}/documents.parquet') TO '{d / "documents.parquet"}'
            (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (SELECT vec_id, embedding, label + 1 AS label
            FROM '{sf}/embeddings.parquet') TO '{d / "embeddings.parquet"}'
            (FORMAT PARQUET)"""
    )
    _time.sleep(0.01)  # ensure mtime_ns differs even on coarse clocks

    idx2 = stored_index_dir(spark, str(d))
    pq2 = stored_pq_index_dir(spark, str(d))[0]
    assert idx2 != idx1 and pq2 != pq1  # fresh directories, rebuilt
    # the rebuilt inverted index actually reflects the mutation
    words = {
        r.word
        for r in spark.read.parquet(idx2).filter("letter = 'z'").collect()
    }
    assert "zmutant" in words


# --------------------------------------------------------------------------
# r10: rag_chunking's window/stride generator
# --------------------------------------------------------------------------


def test_rag_chunk_rows_overlap_and_tail():
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.pipeline import (
        RAG_STRIDE,
        RAG_WINDOW,
        _rag_chunk_rows,
    )

    toks = [f"w{i}" for i in range(45)]
    rows = list(_rag_chunk_rows(" ".join(toks)))
    # starts 0/20/40: every stride boundary below n opens a chunk,
    # tail chunks truncate to the remaining tokens
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (0, 0, 30), (1, 20, 25), (2, 40, 5),
    ]
    # consecutive chunks overlap by window - stride tokens
    assert rows[0][4] == "w29" and rows[1][3] == "w20"
    assert RAG_WINDOW - RAG_STRIDE == 10
    # a short doc yields exactly one whole-doc chunk
    assert list(_rag_chunk_rows("a b c")) == [(0, 0, 3, "a", "c")]


# --------------------------------------------------------------------------
# r11: html_extract's expression-chain extractor
# --------------------------------------------------------------------------


def test_html_main_text_edge_cases(spark):
    """The extractor must survive tag soup the fixture template doesn't
    exercise: uppercase tags, attributes on chrome blocks, a script
    body containing both '<' and a fake closing-ish string, entity
    decode order (&amp;lt; must NOT double-decode), and <header> not
    being eaten by the <head> rule."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.html import (
        html_main_text,
        html_title,
    )
    from pyspark.sql import functions as F

    cases = [
        # (html, expected_main_text)
        ("<HTML><HEAD><TITLE>T</TITLE></HEAD><BODY><P>hi</P></BODY></HTML>",
         "hi"),
        ('<body><nav class="top x">a b c</nav>keep</body>', "keep"),
        ("<script>if (1 < 2) { x = \"</div>\"; }</script>after", "after"),
        ("<style>p>span { color: red }</style>body", "body"),
        # &amp;lt; decodes to the literal string "&lt;", never to "<"
        ("<p>&amp;lt;</p>", "&lt;"),
        ("<p>a&nbsp;b</p>", "a b"),
        # <header> removed as chrome even though <head> rule ran first
        ("<header><h1>x</h1></header>text", "text"),
        # whitespace collapse across tags and newlines
        ("<div>a</div>\n\t<div>b</div>", "a b"),
        ("plain text no tags", "plain text no tags"),
        # comments may span lines, contain '>', even fake tags
        ("a<!-- hidden > <div>no</div>\n more -->b", "a b"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["html"])
    got = [
        r.t for r in df.select(html_main_text(F.col("html")).alias("t")).collect()
    ]
    assert got == [want for _, want in cases]
    tdf = spark.createDataFrame(
        [("<html><head><title> My Title </title></head></html>",)], ["html"]
    )
    assert tdf.select(html_title(F.col("html")).alias("t")).first().t == " My Title "


def test_html_stack_pass_handles_nesting_and_cdata(spark):
    """r12 (VERDICT r11 #8): the stack-pass extractor must be exact on
    the two inputs the expression chain documents as out of scope —
    nested chrome blocks and CDATA-as-text — while agreeing with the
    chain everywhere the chain is correct (the edge-case gallery
    above, re-run through the stack pass)."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.html import (
        html_main_text,
        html_main_text_stack,
    )

    page = (
        "<html><head><title>T</title></head><body>"
        "<nav>outer <nav>inner</nav> trailing-chrome</nav>"
        "<article><p>Real &amp; text</p><![CDATA[kept < literal]]></article>"
        "<script>if (1<2) {}</script></body></html>"
    )
    assert html_main_text_stack(page) == "Real & text kept < literal"
    # ...and the expression form demonstrably gets this page wrong
    # (leaks the nested nav's trailing chrome, drops the CDATA text) —
    # the documented reason the twin exists
    expr = (
        spark.createDataFrame([(page,)], ["html"])
        .select(html_main_text(F.col("html")).alias("t"))
        .first()
        .t
    )
    assert "trailing-chrome" in expr and "kept" not in expr

    # agreement census on the chain's own edge-case gallery (non-nested)
    agree = [
        "<p>plain</p>",
        "a<!-- hidden > <div>no</div>\n more -->b",
        "<style>p { x: 1 }</style>body <b>text</b>",
        '<script>if (1 < 2) { emit("x"); }</script>after',
        "<head><meta x=1><title>t</title></head>real",
        "<nav>chrome</nav>kept <i>words</i>",
        "A &amp; B &lt;tag&gt; &quot;q&quot;&nbsp;&#39;s&#39; &copy;",
        "  spaced\t\n   out  ",
    ]
    df = spark.createDataFrame([(h,) for h in agree], ["html"])
    expr_out = [
        r.t for r in df.select(html_main_text(F.col("html")).alias("t")).collect()
    ]
    assert expr_out == [html_main_text_stack(h) for h in agree]


def test_html_extract_nested_matches_expression_twin_on_fixture(spark):
    """The registered stack-pass query must emit exactly the expression
    query's rows on the fixture corpus (both share the closed-form
    oracle; this pins them against each other directly)."""
    from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    qs = load_all()
    a = {tuple(r) for r in qs["html_extract"].fn(spark, sf).collect()}
    b = {tuple(r) for r in qs["html_extract_nested"].fn(spark, sf).collect()}
    assert a == b


def test_html_wrap_py_equals_spark_template(spark):
    """The driver-side template twin must be byte-identical to the
    Catalyst expression template on adversarial bodies (entities,
    angle brackets, empty) — the WARC HTML shard fixture and the
    closed-form oracles both depend on the equality."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.html import (
        html_wrap,
        html_wrap_py,
    )
    from pyspark.sql import functions as F

    rows = [(1, "plain words"), (22, "a & b < c > d"), (303, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        r.h
        for r in df.select(
            html_wrap(F.col("doc_id"), F.col("text")).alias("h")
        ).collect()
    ]
    assert got == [html_wrap_py(i, t) for i, t in rows]
