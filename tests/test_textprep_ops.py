"""Round-3 training-data operators: repetition filter, benchmark
contamination scan, vocab/OOV coverage, deterministic temperature sampling —
semantics plus DuckDB-oracle parity (the declared SQL twins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.sampling import (
    temperature_sample)
from simpy__kafka__flink__kafka_spark.functions.text import (
    contaminated_docs, repetition_stats, vocab_coverage)
from tests.oracle_utils import assert_match


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- repetition ---------------------------------------------------------------

def test_repetition_ratio_semantics(spark):
    docs = _mkdocs(spark, [
        (1, "a b c a b c a b c"),   # 7 trigrams, 3 distinct
        (2, "one two three four"),  # 2 trigrams, both distinct
        (3, "x y"),                 # too short to shingle
    ])
    got = {r.doc_id: r for r in repetition_stats(docs, n=3).collect()}
    assert (got[1].n_shingles, got[1].n_distinct) == (7, 3)
    assert abs(got[1].rep_ratio - (1 - 3 / 7)) < 1e-6
    assert got[2].rep_ratio == 0.0
    assert (got[3].n_shingles, got[3].rep_ratio) == (0, 0.0)


# --- contamination ------------------------------------------------------------

def test_contamination_flags_verbatim_overlap(spark):
    run = "w0 w1 w2 w3 w4 w5 w6 w7"  # an 8-gram shared verbatim
    docs = _mkdocs(spark, [
        (10, f"{run} tail tail tail"),        # benchmark doc (id % 10 == 0)
        (11, f"head head {run}"),             # contaminated corpus doc
        (12, "clean words only nothing shared here at all ok fine yes"),
    ])
    got = {r.doc_id: r.n_contaminated
           for r in contaminated_docs(docs, n=8, bench_mod=10).collect()}
    assert 11 in got and got[11] >= 1
    assert 12 not in got
    assert 10 not in got  # benchmark docs are never reported against themselves


def test_contamination_counts_distinct_ngrams_only(spark):
    run = "w0 w1 w2 w3 w4 w5 w6 w7"
    docs = _mkdocs(spark, [
        (10, run),
        (11, f"{run} x {run}"),  # same 8-gram appears twice -> counted once
    ])
    got = {r.doc_id: r.n_contaminated
           for r in contaminated_docs(docs, n=8, bench_mod=10).collect()}
    assert got[11] == 1


# --- vocab / OOV --------------------------------------------------------------

def test_vocab_coverage_semantics(spark):
    docs = _mkdocs(spark, [
        (1, "common rare1 common"),
        (2, "common rare2"),
        (3, "common rare3"),
    ])
    # 'common' df=3/3 >= 60%; every 'rareN' df=1/3 < 60% -> OOV
    got = {r.doc_id: r for r in vocab_coverage(docs, min_df_pct=60).collect()}
    assert (got[1].n_tokens, got[1].n_oov) == (3, 1)
    assert (got[2].n_tokens, got[2].n_oov) == (2, 1)
    assert abs(got[1].oov_rate - 1 / 3) < 1e-6


# --- temperature sampling -----------------------------------------------------

def test_temperature_sample_is_deterministic_and_rebalances(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = temperature_sample(docs, strat_col="lang", alpha=0.5, frac=0.5)
    b = temperature_sample(docs, strat_col="lang", alpha=0.5, frac=0.5)
    assert a.exceptAll(b).count() == 0  # hash draw, not an RNG

    natural = {r.lang: r.n for r in
               docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in
            a.where("keep").groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # alpha<1 keeps a LARGER fraction of the smallest stratum than the biggest
    big = max(natural, key=natural.get)
    small = min(natural, key=natural.get)
    assert kept[small] / natural[small] > kept[big] / natural[big]


def test_temperature_alpha_one_is_uniform_rate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = temperature_sample(docs, strat_col="lang", alpha=1.0, frac=0.5)
    # alpha=1: p_s = frac for every stratum
    rates = (
        out.groupBy("lang")
        .agg((F.sum(F.col("keep").cast("int")) / F.count("*")).alias("r"))
        .collect()
    )
    for r in rates:
        assert 0.30 < r.r < 0.70  # hash-uniform around frac=0.5


# --- oracle parity (the declared SQL twins, sf0.001) --------------------------

def test_new_ops_match_oracles(spark, sf_dir):
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    for name in ("repetition_ratio", "contamination_check", "vocab_coverage",
                 "temperature_sample"):
        assert_match(qs[name](spark, sf_dir), osql[name], sf_dir, name)


# --- exact substring spans (ExactSubstr profile) ------------------------------

def test_exact_substring_spans_merges_overlapping_grams(spark):
    # a 40-char run shared by docs 1 and 2 -> ONE maximal span of 40 chars
    # (11 overlapping 30-grams merged), not 11 spans
    shared = "0123456789" * 4                      # 40 chars
    docs = _mkdocs(spark, [
        (1, f"aaaa {shared} bbbb"),
        (2, f"cccc {shared} dddd"),
        (3, "totally unrelated text that is long enough to gram but unique"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)
    got = {r.doc_id: r for r in
           exact_substring_spans(docs, min_len=30).collect()}
    # the span is MAXIMAL: the flanking spaces are shared verbatim too,
    # so the true duplicated run is " <shared> " = 42 chars, as one span
    assert (got[1].n_dup_spans, got[1].dup_chars) == (1, 42)
    assert (got[2].n_dup_spans, got[2].dup_chars) == (1, 42)
    assert (got[3].n_dup_spans, got[3].dup_chars) == (0, 0)


def test_exact_substring_spans_catches_shifted_copy(spark):
    # same payload at DIFFERENT offsets -- invisible to fixed word-block
    # passage dedup when the block grid shifts, visible at char level
    payload = "the quick brown fox jumps over the lazy dog again"
    docs = _mkdocs(spark, [
        (1, f"x {payload}"),
        (2, f"yyyy yyyy yyyy {payload}"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)
    got = {r.doc_id: r for r in
           exact_substring_spans(docs, min_len=30).collect()}
    # maximal span includes the shared leading space: " <payload>" = 50
    assert got[1].n_dup_spans == 1 and got[1].dup_chars == len(payload) + 1
    assert got[2].n_dup_spans == 1 and got[2].dup_chars == len(payload) + 1


def test_exact_substring_spans_ignores_within_doc_repeats(spark):
    # a doc repeating ITS OWN phrase twice is not cross-doc duplication
    phrase = "self repeated phrase thirty characters plus"
    docs = _mkdocs(spark, [
        (1, f"{phrase} middle words here {phrase}"),
        (2, "another doc long enough to produce grams but fully unique"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)
    got = {r.doc_id: r for r in
           exact_substring_spans(docs, min_len=30).collect()}
    assert (got[1].n_dup_spans, got[2].n_dup_spans) == (0, 0)


def test_exact_substring_spans_short_docs_have_no_positions(spark):
    docs = _mkdocs(spark, [(1, "too short"), (2, "also short")])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)
    got = {r.doc_id: r for r in
           exact_substring_spans(docs, min_len=30).collect()}
    assert got[1].n_dup_spans == 0 and got[2].dup_chars == 0
    assert got[1].doc_len == len("too short")


def test_exact_substring_methods_identical(spark):
    # the three detection plans (r5 agg+join, single-window default,
    # winnowing-anchored stride+verify) must be output-identical — the
    # anchor path's exactness rests on the winnowing coverage guarantee
    import random

    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite, exact_substring_spans)

    rng = random.Random(41)
    rows = []
    for d in range(30):
        ws = [f"{rng.getrandbits(96):024x}" for _ in range(rng.randint(2, 12))]
        if d % 3 == 0:
            ws.insert(rng.randint(0, len(ws)),
                      "plantedpayloadplantedpayloadplantedzz")
        rows.append((d, " ".join(ws)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    span_outs = [
        sorted(map(tuple, exact_substring_spans(
            docs, min_len=30, method=m).collect()))
        for m in ("full", "window", "anchor")
    ]
    assert span_outs[0] == span_outs[1] == span_outs[2]
    rw_outs = [
        sorted(map(tuple, exact_substring_rewrite(
            docs, min_len=30, method=m).collect()))
        for m in ("window", "anchor")
    ]
    assert rw_outs[0] == rw_outs[1]
    # small anchor grams (high winnowing density) must stay exact too
    small = sorted(map(tuple, exact_substring_spans(
        docs, min_len=30, method="anchor", anchor_gram=8).collect()))
    assert small == span_outs[0]


def test_exact_substring_methods_identical_on_fixture(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    a = sorted(map(tuple, exact_substring_spans(
        docs, min_len=30, method="full").collect()))
    b = sorted(map(tuple, exact_substring_spans(
        docs, min_len=30, method="anchor").collect()))
    c = sorted(map(tuple, exact_substring_spans(
        docs, min_len=30, method="window").collect()))
    assert a == b == c


def test_exact_substring_rewrite_keeps_first_occurrence_only(spark):
    payload = "the quick brown fox jumps over the lazy dog repeatedly"
    docs = _mkdocs(spark, [
        (1, f"alpha beta {payload} gamma delta unique one text here okay"),
        (2, f"completely different start {payload} and a new ending two"),
        (3, f"third doc prefix material {payload} suffix material three"),
        (4, "no shared content at all in this one just filler words here"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite)
    got = {r.doc_id: r for r in
           exact_substring_rewrite(docs, min_len=30).collect()}
    # min doc_id keeps the payload verbatim
    assert payload in got[1].clean_text and got[1].n_removed_spans == 0
    for d in (2, 3):
        assert payload not in got[d].clean_text
        assert got[d].n_removed_spans == 1
        # maximal span includes both flanking spaces: " <payload> "
        assert got[d].removed_chars == len(payload) + 2
    assert got[4].clean_text == (
        "no shared content at all in this one just filler words here")
    assert got[4].n_removed_spans == 0


def test_exact_substring_rewrite_untouched_doc_is_identity(spark):
    docs = _mkdocs(spark, [
        (1, "  Mixed   CASE text   with   odd spacing all unique here one"),
        (2, "another fully unique document long enough for grams two"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite, normalized)
    got = {r.doc_id: r for r in
           exact_substring_rewrite(docs, min_len=30).collect()}
    norm = {r.doc_id: r.n for r in docs.select(
        "doc_id", normalized("text").alias("n")).collect()}
    for d in (1, 2):
        assert got[d].clean_text == norm[d]
        assert got[d].n_removed_spans == 0 and got[d].removed_chars == 0
        assert got[d].doc_len == len(norm[d])


def test_exact_substring_rewrite_planted_shifted_payload_metamorphic(spark):
    # metamorphic (VERDICT r05 task #2): a >=48-char payload planted at
    # DIFFERENT offsets into 3 of 8 random-hex docs must survive in
    # exactly the smallest doc_id and be fully absent from the other two;
    # untouched docs must come back as their identity-normalized text
    import random

    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite)

    rng = random.Random(23)

    def hexwords(n):
        return " ".join(f"{rng.getrandbits(96):024x}" for _ in range(n))

    for trial in range(3):
        payload = f"{rng.getrandbits(192):048x}"
        carriers = sorted(rng.sample(range(8), 3))
        rows = []
        for doc_id in range(8):
            text = hexwords(rng.randint(3, 10))
            if doc_id in carriers:
                ws = text.split()
                pos = rng.randint(0, len(ws))
                text = " ".join(ws[:pos] + [payload] + ws[pos:])
            rows.append((doc_id, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in
               exact_substring_rewrite(docs, min_len=30).collect()}
        keeper = carriers[0]
        assert payload in got[keeper].clean_text, (trial, keeper)
        for d in carriers[1:]:
            assert payload not in got[d].clean_text, (trial, d)
            assert got[d].n_removed_spans >= 1, (trial, d)
        for d in set(range(8)) - set(carriers):
            assert got[d].n_removed_spans == 0, (trial, d)
            assert got[d].clean_text == rows[d][1], (trial, d)


def test_exact_substring_rewrite_cuts_repeat_inside_keeper_doc(spark):
    # the passage_rewrite rule at char level: the keeper doc's LATER
    # repeat of the shared payload is cut too — only the corpus-wide
    # first occurrence survives
    payload = "shared payload long enough to clear thirty characters"
    docs = _mkdocs(spark, [
        (1, f"{payload} filler middle words go here {payload}"),
        (2, f"other doc also carries {payload} somewhere inside it"),
    ])
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite)
    got = {r.doc_id: r for r in
           exact_substring_rewrite(docs, min_len=30).collect()}
    assert got[1].clean_text.count(payload) == 1
    assert got[1].clean_text.startswith(payload)  # first occurrence kept
    assert got[1].n_removed_spans == 1
    assert payload not in got[2].clean_text


def test_exact_substring_spans_planted_payload_property(spark):
    # metamorphic: plant one shared >=40-char payload into two random-hex
    # corpora docs; exactly those two docs must report a dup span covering
    # at least the payload (maximal spans may extend into equal flanks,
    # never shrink), and no other doc may report anything (random 24-char
    # hex words make chance 30-char matches impossible)
    import random

    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_spans)

    rng = random.Random(17)

    def hexwords(n):
        return " ".join(f"{rng.getrandbits(96):024x}" for _ in range(n))

    for trial in range(3):
        payload = f"{rng.getrandbits(192):048x}"      # 48 chars, unique
        rows = []
        a, b = rng.sample(range(8), 2)
        for doc_id in range(8):
            text = hexwords(rng.randint(3, 10))
            if doc_id in (a, b):
                ws = text.split()
                pos = rng.randint(0, len(ws))
                text = " ".join(ws[:pos] + [payload] + ws[pos:])
            rows.append((doc_id, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in
               exact_substring_spans(docs, min_len=30).collect()}
        for doc_id in range(8):
            if doc_id in (a, b):
                assert got[doc_id].n_dup_spans >= 1, (trial, doc_id)
                assert got[doc_id].dup_chars >= len(payload), (trial, doc_id)
            else:
                assert got[doc_id].n_dup_spans == 0, (trial, doc_id)


def _ref_substring_rewrite(texts, L):
    """Pure-Python reference of the exact_substring_rewrite contract:
    per duplicated gram the minimum (doc_id, position) occurrence is
    kept, every other occurrence's start is removable; removable starts
    merge into maximal islands; covered char ranges are cut."""
    occ = {}
    for d in sorted(texts):
        t = texts[d]
        for p in range(len(t) - L + 1):
            occ.setdefault(t[p:p + L], []).append((d, p))
    removable = {d: [] for d in texts}
    for lst in occ.values():
        if len({d for d, _ in lst}) >= 2:
            for d, p in lst[1:]:
                removable[d].append(p)
    out = {}
    for d, t in texts.items():
        starts = sorted(set(removable[d]))
        spans = []
        for p in starts:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + L)
            else:
                spans.append([p, p + L])
        clean = []
        prev = 0
        for s0, s1 in spans:
            clean.append(t[prev:s0])
            prev = s1
        clean.append(t[prev:])
        out[d] = (len(t), len(spans), sum(s1 - s0 for s0, s1 in spans),
                  "".join(clean))
    return out


def test_exact_substring_rewrite_matches_python_reference(spark):
    # independent semantic pin (the DuckDB oracle and the Spark plan are
    # separately expressed, but a shared misreading of the contract could
    # slip both): tiny-alphabet random corpora force dense chance repeats
    # — worst case for both island merging and the anchor path's
    # selectivity — and every method must equal the reference exactly
    import random

    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite)

    L = 12
    for seed in (3, 17, 101):
        rng = random.Random(seed)
        texts = {
            d: "".join(rng.choice("ab ") for _ in range(rng.randint(40, 120)))
            .strip() or "a" * 20
            for d in range(6)
        }
        # normalized form: collapse runs of spaces + lowercase (already)
        import re
        texts = {d: re.sub(r"\s+", " ", t).strip() for d, t in texts.items()}
        texts = {d: t if t else "a" * 20 for d, t in texts.items()}
        want = _ref_substring_rewrite(texts, L)
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string")
        for method, l0 in (("window", None), ("anchor", None), ("anchor", 4)):
            got = {r.doc_id: (r.doc_len, r.n_removed_spans, r.removed_chars,
                              r.clean_text)
                   for r in exact_substring_rewrite(
                       docs, min_len=L, method=method,
                       anchor_gram=l0).collect()}
            assert got == want, (seed, method, l0)


def test_exact_substring_methods_identical_on_unicode(spark):
    # non-ASCII text: the anchor path winnows over a codepoint array and
    # slices anchor grams in Python — char coordinates must agree with
    # Spark's substr (both codepoint-based) or candidate regions drift
    from simpy__kafka__flink__kafka_spark.functions.text import (
        exact_substring_rewrite, exact_substring_spans)

    payload = "héllo wörld — ünïcode payload ✓ emoji 🎉 end of span"
    docs = _mkdocs(spark, [
        (1, f"prefix α {payload} suffix β unique einz"),
        (2, f"different start γ {payload} another end zwei"),
        (3, "ασχετο κείμενο αρκετά μεγάλο για γραμμάρια μοναδικό τρία"),
    ])
    outs = [
        sorted(map(tuple, exact_substring_spans(
            docs, min_len=20, method=m).collect()))
        for m in ("full", "window", "anchor")
    ]
    assert outs[0] == outs[1] == outs[2]
    # the payload really was detected (not vacuously equal)
    by_id = {t[0]: t for t in outs[0]}
    assert by_id[1][2] >= 1 and by_id[2][2] >= 1  # n_dup_spans
    assert by_id[3][2] == 0
    rw = [
        sorted(map(tuple, exact_substring_rewrite(
            docs, min_len=20, method=m).collect()))
        for m in ("window", "anchor")
    ]
    assert rw[0] == rw[1]
    clean = {t[0]: t[4] for t in rw[0]}
    assert payload.lower() in clean[1]      # keeper (min doc_id)
    assert payload.lower() not in clean[2]  # cut from the later doc


def test_inverted_index_hand_case(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        inverted_index)

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma"), (10, "alpha")],
        "doc_id long, text string")
    got = {r["term"]: r for r in inverted_index(docs).collect()}
    assert got["alpha"]["df"] == 2 and got["alpha"]["total_tf"] == 3
    assert got["beta"]["df"] == 2 and got["beta"]["total_tf"] == 2
    assert got["gamma"]["df"] == 1
    # postings fingerprint: zero-padded doc ids in numeric order
    import hashlib
    want = hashlib.md5(
        b"000000000001:2,000000000010:1").hexdigest()
    assert got["alpha"]["postings_hash"] == want


def test_inverted_index_registry_row(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["inverted_index"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "inverted_index")


def test_nfc_normalize_composes_and_folds(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        nfc_normalize_text)

    decomposed = "Café  du\tparc\x07!"
    df = spark.createDataFrame([(1, decomposed), (2, "clean text")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in nfc_normalize_text(df).collect()}
    assert out[1]["norm_text"] == "Café du parc !"
    assert out[1]["changed"] == 1
    assert out[1]["n_chars"] == len("Café du parc !")
    assert out[2]["norm_text"] == "clean text"
    assert out[2]["changed"] == 0


def test_unicode_normalize_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["unicode_normalize"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "unicode_normalize")


def test_nfc_normalize_null_text_keeps_row(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import (
        nfc_normalize_text)

    df = spark.createDataFrame([(1, None), (2, "ok")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in nfc_normalize_text(df).collect()}
    assert out[1]["norm_text"] is None and out[1]["n_chars"] is None
    assert out[1]["changed"] == 0
    assert out[2]["norm_text"] == "ok"


def test_corpus_datasheet_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["corpus_datasheet"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "corpus_datasheet")


def test_corpus_datasheet_semantics(spark):
    from simpy__kafka__flink__kafka_spark.functions.profiling import (
        corpus_datasheet)

    rows = [
        (1, "the and is of to in good long document text here", "a"),
        (2, "the and is of to in good long document text here", "a"),
        (3, "el la los las es un una en por para otra frase", "a"),
        (4, "unique english words the of and appear here now", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = {r["source"]: r for r in corpus_datasheet(docs).collect()}
    # source a: docs 1,2 verbatim dups -> 2 unique fps among 3 docs
    assert out["a"]["n_docs"] == 3 and out["a"]["n_unique_fp"] == 2
    assert out["a"]["dup_ppm"] == 1_000_000 // 3
    assert out["a"]["top_lang"] == "en"     # 2 en docs vs 1 es
    assert out["b"]["dup_ppm"] == 0
