"""Property-based tests (hypothesis): invariants that golden cases can't
exhaust. Each example generates a BATCH of inputs and round-trips it through
one Spark job, keeping example count low and per-example work vectorized."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# URL-ish strings: schemes good and bad, mixed case, ports, fragments, junk
url_strategy = st.builds(
    lambda scheme, host, port, path, frag: f"{scheme}://{host}{port}{path}{frag}",
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp", "x+y.z-1", ""]),
    host=st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/", "/A/b?Q=1", "/p%20x", "//odd"]),
    frag=st.sampled_from(["", "#f", "#a#b"]),
) | st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


class TestCanonicalizeProperties:
    @settings(**SETTINGS)
    @given(st.lists(url_strategy, min_size=1, max_size=25))
    def test_idempotent(self, spark, urls):
        """canonicalize(canonicalize(u)) == canonicalize(u) — the seen-set
        key must be a fixed point or identical URLs would never dedup."""
        from wbx.frontier import canonicalize_url

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = df.select(canonicalize_url(F.col("url")).alias("c1"))
        twice = once.select(
            "c1", canonicalize_url(F.col("c1")).alias("c2")
        ).collect()
        for r in twice:
            assert r["c2"] == r["c1"], (r["c1"], r["c2"])

    @settings(**SETTINGS)
    @given(st.lists(url_strategy, min_size=1, max_size=25))
    def test_no_fragment_and_scheme_marker(self, spark, urls):
        from wbx.frontier import canonicalize_url

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect():
            assert "#" not in r["c"]
            assert "://" in r["c"]


text_strategy = st.text(
    alphabet=st.characters(
        # any printable unicode incl. multi-byte; exclude surrogates
        min_codepoint=1,
        max_codepoint=0x2FFF,
        blacklist_categories=("Cs",),
    ),
    max_size=300,
)


class TestWarcRoundtripProperties:
    @settings(**SETTINGS)
    @given(st.lists(text_strategy, min_size=1, max_size=12))
    def test_text_survives_synth_scan_extract(self, spark, texts):
        """The input_hint byte-identity invariant on ARBITRARY unicode text:
        synthesize → scan → fused-extract must return the exact text."""
        from wbx.fixtures import synth_warc_files
        from wbx.warcio import scan_files_to_text

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        files = synth_warc_files(docs, n_files=2)
        got = {
            int(r["target_uri"].rsplit("/", 1)[1]): r["text"]
            for r in scan_files_to_text(files).collect()
        }
        assert got == dict(enumerate(texts))

    @settings(**SETTINGS)
    @given(st.lists(text_strategy, min_size=1, max_size=8))
    def test_offsets_partition_the_file(self, spark, texts):
        """Scan offsets are internally consistent on arbitrary content:
        header/content spans nest inside the record, records don't overlap."""
        from wbx.fixtures import synth_warc_files
        from wbx.warcio import scan_files_to_records

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        recs = (
            scan_files_to_records(synth_warc_files(docs, n_files=1))
            .orderBy("record_start")
            .collect()
        )
        prev_end = 0
        for r in recs:
            assert r["record_start"] >= prev_end
            assert r["record_start"] <= r["header_end"] <= r["content_start"]
            assert r["content_start"] <= r["content_end"] == r["record_end"]
            prev_end = r["record_end"]


text_lines_strategy = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
    ),
    min_size=0,
    max_size=8,
).map(lambda ls: "\n".join(ls))


class TestTextopsProperties:
    @settings(**SETTINGS)
    @given(st.lists(text_lines_strategy, min_size=1, max_size=20))
    def test_c4_clean_is_idempotent(self, spark, texts):
        """Every surviving line already satisfies the line rules, so a
        second cleaning pass must be the identity."""
        from wbx import textops

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        once = df.select(textops.c4_clean_lines(F.col("text")).alias("c1"))
        rows = once.select(
            "c1", textops.c4_clean_lines(F.col("c1")).alias("c2")
        ).collect()
        for r in rows:
            assert r["c2"] == r["c1"], (r["c1"], r["c2"])

    @settings(**SETTINGS)
    @given(st.lists(text_lines_strategy, min_size=1, max_size=20))
    def test_repetition_fractions_bounded(self, spark, texts):
        """All repetition ratios live in [0, 1] (or NULL for NULL text)."""
        from wbx import textops

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        feats = textops.repetition_features(F.col("text"))
        keys = [k for k in feats if k.endswith("_frac")]
        rows = df.select(*[feats[k].alias(k) for k in keys]).collect()
        for r in rows:
            for k in keys:
                v = r[k]
                assert v is None or (0.0 <= v <= 1.0), (k, v)

    @settings(**SETTINGS)
    @given(st.lists(text_lines_strategy, min_size=1, max_size=10))
    def test_pii_scrub_removes_every_email(self, spark, texts):
        """After scrubbing, the email pattern never matches — replacement
        is complete, not first-occurrence."""
        from wbx import textops

        salted = [
            f"{t} a{i}@ex{i}.org mid {t} b{i}@host{i}.net" for i, t in enumerate(texts)
        ]
        df = spark.createDataFrame([(t,) for t in salted], "text string")
        rows = df.select(
            textops.pii_scrub(F.col("text")).alias("t")
        ).collect()
        import re as _re

        for r in rows:
            assert not _re.search(textops.PII_EMAIL_RE, r["t"]), r["t"]


# numeric character references: decimal and hex forms across the codepoint
# space, plus invalid ones (zero, surrogates, out-of-range, junk)
_numref_strategy = st.one_of(
    st.integers(min_value=1, max_value=0x10FFFF).map(lambda c: f"&#{c};"),
    st.integers(min_value=1, max_value=0x10FFFF).map(lambda c: f"&#x{c:x};"),
    st.integers(min_value=1, max_value=0x10FFFF).map(lambda c: f"&#X{c:X};"),
    st.sampled_from(["&#0;", "&#xD800;", "&#xDFFF;", "&#1114112;", "&#zz;", "&#", "&#;"]),
)


class TestEntityDecodeProperties:
    @settings(**SETTINGS)
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(
                        min_codepoint=32,
                        max_codepoint=126,
                        exclude_characters="&<",
                    ),
                    max_size=12,
                ),
                _numref_strategy,
                st.text(
                    alphabet=st.characters(
                        min_codepoint=32,
                        max_codepoint=126,
                        exclude_characters="&<",
                    ),
                    max_size=12,
                ),
            ),
            min_size=1,
            max_size=24,
        )
    )
    def test_numeric_decode_matches_html_unescape(self, spark, parts):
        """decode_numeric_entities agrees with Python's html.unescape on
        every VALID numeric reference outside the HTML5 C1-remapping range
        (unescape applies the windows-1252 compat table for 0x80-0x9F and
        replaces nonchars — our decoder is a strict codepoint decoder, so
        those are excluded by construction here), and leaves the invalid
        forms exactly as written, where unescape drops/mangles them."""
        import html as _html
        import re

        from wbx.extract import decode_numeric_entities

        texts = [f"{a}{ref}{b}" for a, ref, b in parts]
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = [
            r["d"]
            for r in df.select(
                decode_numeric_entities(F.col("t")).alias("d")
            ).collect()
        ]
        valid_re = re.compile(r"^&#(?:([0-9]{1,7})|[xX]([0-9a-fA-F]{1,6}));$")
        for t, (a, ref, b), d in zip(texts, parts, got):
            m = valid_re.match(ref)
            code = None
            if m:
                code = int(m.group(1)) if m.group(1) else int(m.group(2), 16)
            # html.unescape INTENTIONALLY diverges from a strict codepoint
            # decoder on its windows-1252 compat table (incl. CR and the
            # C1 block) and its dropped-invalid set (C0 controls,
            # noncharacters) — both are the stdlib's own tables, so the
            # agreement set is exact, not hand-listed. Our decoder is a
            # strict codepoint decoder: it decodes those too.
            from html import _invalid_charrefs, _invalid_codepoints

            ours_decodes = (
                code is not None
                and 0 < code <= 0x10FFFF
                and not (0xD800 <= code <= 0xDFFF)
                and code != 38  # deferred to the amp pass by design
            )
            unescape_agrees = (
                code not in _invalid_charrefs and code not in _invalid_codepoints
            )
            if ours_decodes and unescape_agrees:
                assert d == _html.unescape(t), (t, d)
            elif ours_decodes:
                assert d == f"{a}{chr(code)}{b}", (t, d)
            else:
                assert d == t, (t, d)  # invalid/deferred refs stay literal


class TestChunkingProperties:
    @settings(**SETTINGS)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("L", "N", "P", "Z"),
                    whitelist_characters="\n\t",
                ),
                max_size=200,
            ),
            min_size=1,
            max_size=10,
        ),
        st.integers(min_value=2, max_value=9),
        st.integers(min_value=0, max_value=7),
    )
    def test_chunks_reconstruct_normalized_text(self, spark, texts, chunk, overlap):
        """Dropping each chunk's first `overlap` tokens (after chunk 0) and
        concatenating reconstructs the whitespace-normalized document —
        i.e. windows tile the token stream exactly, no token lost or
        duplicated, for ANY (chunk, overlap < chunk) and any text."""
        from wbx.textops import chunk_documents

        if overlap >= chunk:
            overlap = chunk - 1
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = chunk_documents(
            docs, chunk_words=chunk, overlap_words=overlap
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"])
            )
        import re as _re

        for doc_id, text in enumerate(texts):
            # mirror the engine contract: ASCII \s (Java/RE2 semantics —
            # \xa0 etc. are NOT separators), ends trimmed first
            toks = [
                t
                for t in _re.split(
                    r"\s+", text.strip(" \t\n\r\x0b\x0c"), flags=_re.ASCII
                )
                if t != ""
            ]
            want = " ".join(toks)
            got_rows = sorted(by_doc.get(doc_id, []))
            # blank text -> one empty chunk; NULL never generated here
            pieces = []
            for cid, ctext in got_rows:
                ctoks = ctext.split(" ") if ctext else []
                pieces.extend(ctoks if cid == 0 else ctoks[overlap:])
            # trailing windows may re-cover earlier tokens when the last
            # stride overshoots; truncate to the doc token count
            assert pieces[: len(toks)] == toks or " ".join(pieces) == want

    @settings(**SETTINGS)
    @given(st.lists(st.text(max_size=150), min_size=1, max_size=8))
    def test_anchor_links_subset_of_document_links(self, spark, htmls):
        """Anchor-scoped discovery never invents a link: for arbitrary
        (junk) HTML bytes, extract_anchor_links(respect off) ⊆
        extract_links output for the same pages."""
        from wbx.frontier import extract_anchor_links, extract_links

        pages = spark.createDataFrame(
            [
                (f"http://h{i}.example/d/p", h.encode("utf-8", "ignore"))
                for i, h in enumerate(htmls)
            ],
            "url string, html binary",
        )
        anchors = {
            (r["url"], r["link"])
            for r in extract_anchor_links(
                pages, respect_nofollow=False, respect_meta=False
            ).collect()
        }
        doc = {
            (r["url"], r["link"])
            for r in extract_links(pages).collect()
        }
        assert anchors <= doc
