"""Property-based tests (hypothesis) for the core kit — coverage the
reference lacks entirely (SURVEY §5: no property/randomized testing).

Each property runs a small number of examples (Spark round-trips are the
cost driver); the properties themselves are the strong part:
- deterministic ids are a pure function of the row multiset (partition-
  and order-independent) — the exact guarantee monotonically_increasing_id
  breaks in the reference;
- cleaning is idempotent;
- exact-dedup groups partition the input.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    min_size=0,
    max_size=12,
)


@SLOW
@given(st.lists(names, min_size=1, max_size=30))
def test_dense_ids_are_order_and_partition_independent(spark, rows):
    from pdcm_etl_spark.functions.ids import add_id

    df1 = spark.createDataFrame([(r,) for r in rows], "name string").repartition(7)
    df2 = spark.createDataFrame([(r,) for r in reversed(rows)], "name string").coalesce(1)
    m1 = {r["name"]: r["id"] for r in add_id(df1, key_cols=["name"]).collect()}
    m2 = {r["name"]: r["id"] for r in add_id(df2, key_cols=["name"]).collect()}
    assert m1 == m2
    # dense: ids cover 1..K for K distinct keys
    assert set(m1.values()) == set(range(1, len(set(rows)) + 1))


@SLOW
@given(st.lists(names, min_size=1, max_size=30))
def test_hash_ids_are_stable_and_key_pure(spark, rows):
    from pdcm_etl_spark.functions.ids import hash_id

    df = spark.createDataFrame([(r,) for r in rows], "name string")
    a = {r["name"]: r["h"] for r in df.select("name", hash_id("name").alias("h")).collect()}
    b = {r["name"]: r["h"] for r in df.repartition(5).select("name", hash_id("name").alias("h")).collect()}
    assert a == b


@SLOW
@given(st.lists(st.text(max_size=16), min_size=1, max_size=25))
def test_trim_all_is_idempotent(spark, rows):
    from pdcm_etl_spark.functions.cleaner import trim_all

    df = spark.createDataFrame([(r,) for r in rows], "s string")
    out = df.select(
        trim_all("s").alias("once"), trim_all(trim_all("s")).alias("twice")
    )
    assert all(r["once"] == r["twice"] for r in out.collect())


@SLOW
@given(st.lists(st.sampled_from(["a b c", "a  b", "x", "", "a b c d"]), min_size=1, max_size=40))
def test_exact_dedup_partitions_the_input(spark, texts):
    from pdcm_etl_spark.operators.dedup import exact_dup_groups

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    groups = exact_dup_groups(df).collect()
    # group sizes sum to the row count; keep ids are members
    assert sum(g["n_docs"] for g in groups) == len(texts)
    keep = {g["keep_id"] for g in groups}
    assert keep <= set(range(len(texts)))


@pytest.mark.parametrize("n", [0, 1, 2])
def test_shingles_short_docs_are_empty_not_errors(spark, n):
    from pdcm_etl_spark.operators.dedup import shingles

    text = " ".join(["w"] * n)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert shingles(df, n=3).count() == 0


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join == per-row brute force: the latest right row with
    ts <= left.ts on the same key (backward, left-outer)."""
    import datetime

    from pdcm_etl_spark.operators.temporal import asof_join

    t = lambda s: datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)
    # unique (key, ts) on the right: as-of tie-break among duplicate
    # timestamps is undefined (same contract as the catalog query)
    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = v
    rrows = [(k, t(ts), v) for (k, ts), v in rmap.items()]
    left = spark.createDataFrame(
        [(k, t(ts)) for k, ts in lefts], ["k", "ts"]
    )
    right = spark.createDataFrame(rrows, ["k", "ts", "v"]) if rrows else (
        spark.createDataFrame([], "k long, ts timestamp, v long")
    )
    got = {
        (r["k"], r["ts"]): r["r_v"]
        for r in asof_join(left, right, on=["k"]).collect()
    }
    for k, ts in lefts:
        cands = [
            (rts, v) for (rk, rts), v in rmap.items() if rk == k and rts <= ts
        ]
        want = max(cands)[1] if cands else None
        assert got[(k, t(ts))] == want, (k, ts, cands)


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=0,
        max_size=30,
    )
)
def test_connected_components_match_union_find(spark, edges):
    from pdcm_etl_spark.operators.graph import connected_components

    nodes = sorted({n for e in edges for n in e} | {0, 99})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}
    # canonical label = min member of the component
    comp_min = {}
    for n, r in want.items():
        comp_min.setdefault(r, n)
        comp_min[r] = min(comp_min[r], n)
    want = {n: comp_min[find(n)] for n in nodes}

    edf = (
        spark.createDataFrame(list(edges), ["src", "dst"])
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    ndf = spark.createDataFrame([(n,) for n in nodes], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == want


@given(
    n_words=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=10),
)
@SLOW
def test_chunking_covers_exactly_with_declared_overlap(spark, n_words, chunk, overlap):
    """Every token appears; consecutive chunks share exactly `overlap`
    tokens; concatenating chunks minus overlaps reconstructs the doc."""
    from pdcm_etl_spark.operators.text import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = (
        chunk_documents(df, chunk_size=chunk, overlap=overlap)
        .orderBy("chunk_index")
        .collect()
    )
    texts = [r["chunk_text"].split(" ") for r in rows]
    reconstructed = texts[0] + [t for c in texts[1:] for t in c[overlap:]]
    assert reconstructed == words
    for a, b in zip(texts, texts[1:]):
        assert a[-overlap:] == b[:overlap] if overlap else True
    for r, c in zip(rows, texts):
        assert r["chunk_tokens"] == len(c) <= chunk


@given(
    updates=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.sampled_from(["a", "b", "c"]),        # value
        ),
        min_size=0,
        max_size=8,
    )
)
@SLOW
def test_scd2_matches_sequential_fold(spark, updates):
    """Applying one scd2_merge with the batch's latest-per-key update set
    equals folding updates per key sequentially (Type-2 reference model:
    only the final state of the open rows matters within a batch)."""
    import datetime

    from pyspark.sql import types as T

    from pdcm_etl_spark.operators.cdc import scd2_merge

    base_ts = datetime.datetime(2024, 1, 1)
    dim_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
    ])
    upd_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    dim_rows = [(k, "init", base_ts, None, True) for k in range(3)]
    upd_rows = [
        (k, v, base_ts + datetime.timedelta(days=i + 1))
        for i, (k, v) in enumerate(updates)
    ]
    dim = spark.createDataFrame(dim_rows, dim_schema)
    upd = spark.createDataFrame(upd_rows, upd_schema)
    got = sorted(map(tuple, scd2_merge(dim, upd, ["k"], ["v"]).collect()))

    # reference fold: latest update per key wins; open row closes iff the
    # latest value differs
    latest: dict[int, tuple] = {}
    for i, (k, v) in enumerate(updates):
        ts = base_ts + datetime.timedelta(days=i + 1)
        if k not in latest or ts > latest[k][1]:
            latest[k] = (v, ts)
    expect = []
    for k in range(3):
        if k in latest and latest[k][0] != "init":
            v, ts = latest[k]
            expect.append((k, "init", base_ts, ts, False))
            expect.append((k, v, ts, None, True))
        else:
            expect.append((k, "init", base_ts, None, True))
    for k, (v, ts) in latest.items():
        if k >= 3:
            expect.append((k, v, ts, None, True))
    assert got == sorted(expect)


@SLOW
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000),
                  min_size=1, max_size=60, unique=True),
    parts=st.integers(min_value=1, max_value=7),
    n_shards=st.integers(min_value=1, max_value=5),
)
def test_shuffle_shards_partition_invariant(spark, keys, parts, n_shards):
    """The whole point of the deterministic shuffle: (shard, pos) per key
    is a pure function of the key multiset — independent of the input's
    physical partitioning (orderBy(rand()) breaks exactly this)."""
    from pdcm_etl_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(k,) for k in keys], "doc_id bigint")
    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shards(df, "doc_id", n_shards).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shards(
            df.repartition(parts), "doc_id", n_shards
        ).collect()
    }
    assert a == b
    # positions are a 1..k dense sequence within every shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), (shard, poss)


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24),
        min_size=1, max_size=20,
    )
)
def test_ngram_counts_match_reference_fold(spark, texts):
    """Bigram counts equal a literal per-document fold (repeats kept —
    counting semantics, not the dedup shingler's set semantics)."""
    from collections import Counter

    from pdcm_etl_spark.operators.text import ngram_counts

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["ngram"]: r["n"] for r in ngram_counts(df, n=2).collect()}
    expect: Counter = Counter()
    for t in texts:
        ws = t.lower().split(" ")
        for i in range(len(ws) - 1):
            expect[ws[i] + " " + ws[i + 1]] += 1
    assert got == dict(expect)


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1, max_size=40,
        ).map(" ".join),
        min_size=1, max_size=12,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_paragraph_dedup_properties(spark, texts, parts):
    """CCNet-style segment dedup invariants: (a) partition-independent,
    (b) kept-segment total == distinct segment count corpus-wide,
    (c) the lowest-id doc among exact duplicates keeps everything and
    later copies keep nothing, (d) n_kept <= n_segs."""
    from pdcm_etl_spark.operators.dedup import paragraph_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["id"]: (r["n_segs"], r["n_kept"], r["kept_text"])
        for r in paragraph_dedup(df, seg_words=4).collect()
    }
    rep = {
        r["id"]: (r["n_segs"], r["n_kept"], r["kept_text"])
        for r in paragraph_dedup(df.repartition(parts), seg_words=4).collect()
    }
    assert got == rep
    # python replica of the segmentation + first-occurrence rule
    seen: set[str] = set()
    for i, t in sorted(rows):
        ws = t.lower().split(" ")
        segs = [" ".join(ws[j * 4 : j * 4 + 4]) for j in range((len(ws) + 3) // 4)]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        n_segs, n_kept, kept_text = got[i]
        assert n_segs == len(segs)
        assert n_kept == len(kept)
        assert kept_text == " ".join(kept)


@SLOW
@given(
    n_docs=st.integers(min_value=1, max_value=80),
    parts=st.integers(min_value=1, max_value=5),
)
def test_domain_mix_sample_properties(spark, n_docs, parts):
    """Domain-mix sampling invariants: deterministic under partitioning,
    a subset of the input, rate_ppm respects the min(1e6, budget·w·N/(W·n))
    formula exactly."""
    from pdcm_etl_spark.operators.sampling import domain_mix_sample

    rows = [(i, f"d{i % 3}") for i in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    weights = {"d0": 1, "d1": 3, "d2": 6}
    kw = dict(key_col="doc_id", domain_col="source", weights=weights,
              budget_ppm=400_000)
    a = sorted(
        (r["doc_id"], r["weight"], r["rate_ppm"])
        for r in domain_mix_sample(df, **kw).collect()
    )
    b = sorted(
        (r["doc_id"], r["weight"], r["rate_ppm"])
        for r in domain_mix_sample(df.repartition(parts), **kw).collect()
    )
    assert a == b
    ids = {i for i, _, _ in a}
    assert ids <= {i for i, _ in rows}
    # exact integer rate formula
    from collections import Counter

    n_by = Counter(s for _, s in rows)
    W = sum(weights[s] for s in n_by)
    N = n_docs
    for _, w, rate in a:
        dom = [s for s in n_by if weights[s] == w]
        assert any(
            rate == min(1_000_000, (400_000 * w * N) // (W * n_by[s]))
            for s in dom
        )


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ab", "abc", "banana", "x", "query", "scan"]),
            min_size=1, max_size=20,
        ).map(" ".join),
        min_size=1, max_size=10,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_bpe_pair_counts_matches_python_replica(spark, texts, parts):
    """BPE pair statistics: partition-independent and equal to the naive
    python count (pair freq = sum over corpus words of adjacent char
    pairs, weighted by word occurrences)."""
    from collections import Counter

    from pdcm_etl_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, top_k=1000).collect()]
    rep = [(r["pair"], r["n"])
           for r in bpe_pair_counts(df.repartition(parts), top_k=1000).collect()]
    assert got == rep
    expect = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if not w:
                continue
            for i in range(len(w) - 1):
                expect[w[i : i + 2]] += 1
    assert dict(got) == dict(expect)
    # ranking: count desc, pair asc
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aaaa", "aab", "banana", "abab", "bb", "a"]),
            min_size=1, max_size=15,
        ).map(" ".join),
        min_size=1, max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=3),
)
def test_bpe_train_matches_python_replica(spark, texts, n_merges):
    """The distributed BPE loop must equal the classic sequential
    trainer: same winning pair each round (count desc, pair asc
    tiebreak) and same greedy left-to-right merge application — the
    'aaaa' fixtures exercise the overlapping-match (a==b) alternation
    rule the fold must get right."""
    from collections import Counter

    from pdcm_etl_spark.operators.text import bpe_train

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["r"], r["a"], r["b"], r["merged"], r["n"])
        for r in bpe_train(df, n_merges=n_merges).collect()
    ]

    # sequential reference implementation
    vocab = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    expect = []
    for r in range(1, n_merges + 1):
        pairs = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((r, a, b, a + b, n))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == expect


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_inverted_index_two_level_topk_matches_naive(spark, texts, k):
    """The two-level (term, bucket) top-k must be bit-identical to the
    naive single-window form for any k / bucket count / doc-id spread."""
    from pdcm_etl_spark.operators.text import inverted_index

    rows = [(i * 7 + 3, t) for i, t in enumerate(texts)]  # non-contiguous ids
    df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(5)
    got = {
        r["term"]: (r["df"], r["cf"], r["postings"])
        for r in inverted_index(
            df, max_postings=k, min_df=1, sub_buckets=3
        ).collect()
    }
    # python reference
    from collections import defaultdict

    docs_of = defaultdict(set)
    cf = defaultdict(int)
    for doc_id, t in rows:
        for w in t.lower().split(" "):
            if w:
                docs_of[w].add(doc_id)
                cf[w] += 1
    want = {
        w: (
            len(ids),
            cf[w],
            ",".join(str(i) for i in sorted(ids)[:k]),
        )
        for w, ids in docs_of.items()
    }
    assert got == want


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=5).map(" ".join),
        min_size=1,
        max_size=20,
    )
)
def test_unigram_lm_score_matches_python_replica(spark, texts):
    from pdcm_etl_spark.operators.text import unigram_lm_score

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(4)
    got = {
        r["doc_id"]: (r["n_words"], r["lm_score_ppm"], r["hapax_bp"], r["rarest_count"])
        for r in unigram_lm_score(df).collect()
    }
    from collections import Counter

    counts = Counter(w for _, t in rows for w in t.lower().split(" ") if w)
    n_total = sum(counts.values())
    want = {}
    for doc_id, t in rows:
        ws = [w for w in t.lower().split(" ") if w]
        if not ws:
            continue
        f = [(counts[w] * 1_000_000) // n_total for w in ws]
        hapax = sum(1 for w in ws if counts[w] == 1)
        want[doc_id] = (
            len(ws),
            sum(f) // len(ws),
            (hapax * 10_000) // len(ws),
            min(counts[w] for w in ws),
        )
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_stump_train_matches_bruteforce(spark, rows):
    """The histogram-window stump must equal the brute-force exact 0-1
    stump (every threshold tried, both majority directions) per feature,
    including the smallest-threshold tie-break."""
    from pdcm_etl_spark.operators.ml import stump_train

    df = spark.createDataFrame(
        rows, "f1 bigint, f2 bigint, lbl bigint"
    ).repartition(4)
    got = {
        r["feature"]: (r["threshold"], r["errors"], r["total"], r["acc_bp"])
        for r in stump_train(df, ["f1", "f2"], "lbl").collect()
    }
    want = {}
    total = len(rows)
    for fi, feat in [(0, "f1"), (1, "f2")]:
        best = None
        for t in sorted({r[fi] for r in rows}):
            left = [r[2] for r in rows if r[fi] <= t]
            right = [r[2] for r in rows if r[fi] > t]
            errors = min(sum(left), len(left) - sum(left)) + min(
                sum(right), len(right) - sum(right)
            )
            if best is None or (errors, t) < best:
                best = (errors, t)
        want[feat] = (
            best[1],
            best[0],
            total,
            ((total - best[0]) * 10_000) // total,
        )
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=2, max_value=8),
)
def test_zorder_stats_matches_python_morton(spark, points, bits):
    from pdcm_etl_spark.operators.layout import zorder_stats

    df = spark.createDataFrame(points, "x bigint, y bigint").repartition(3)
    n_files = 8
    got = {
        r["file_id"]: (r["n_rows"], r["x_min"], r["x_max"], r["y_min"], r["y_max"])
        for r in zorder_stats(df, "x", "y", bits=bits, n_files=n_files).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(bits):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        return z

    mask = (1 << bits) - 1
    width = max(1, (1 << (2 * bits)) // n_files)
    from collections import defaultdict

    files = defaultdict(list)
    for x, y in points:
        files[morton(x & mask, y & mask) // width].append((x & mask, y & mask))
    want = {
        fid: (
            len(pts),
            min(p[0] for p in pts),
            max(p[0] for p in pts),
            min(p[1] for p in pts),
            max(p[1] for p in pts),
        )
        for fid, pts in files.items()
    }
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_pagerank_matches_python_fold(spark, edges, iters):
    """The distributed integer PageRank must equal a sequential Python
    fold of the same floored recurrence — including multi-edge
    contributions and dangling-node leakage."""
    from pdcm_etl_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(3)
    got = {
        r["node"]: r["pr_micro"] for r in pagerank(df, iterations=iters).collect()
    }
    from collections import Counter, defaultdict

    nodes = {n for e in edges for n in e}
    outdeg = Counter(s for s, _ in edges)
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += (pr[s] * 85) // (100 * outdeg[s])
        pr = {n: 150_000 + inflow[n] for n in nodes}
    assert got == pr


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user
            st.sampled_from(["a", "b", "c"]),            # stage type
            st.integers(min_value=0, max_value=50),      # ts (seconds)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_stages_matches_sequential_scan(spark, evs):
    """The join-chain funnel must equal a per-user sequential scan of
    the time-sorted history (strictly-after semantics at every stage)."""
    import datetime

    from pdcm_etl_spark.operators.temporal import funnel_stages

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, t, base + datetime.timedelta(seconds=s)) for u, t, s in evs
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    ).repartition(3)
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"], r["stages_reached"])
        for r in funnel_stages(df, ["a", "b", "c"]).collect()
    }
    want = {}
    users = {u for u, _, _ in rows}
    for u in users:
        hist = sorted((ts, t) for uu, t, ts in rows if uu == u)
        t1 = min((ts for ts, t in hist if t == "a"), default=None)
        t2 = (
            min((ts for ts, t in hist if t == "b" and ts > t1), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((ts for ts, t in hist if t == "c" and ts > t2), default=None)
            if t2 is not None
            else None
        )
        if t1 is not None:
            want[u] = (t1, t2, t3, sum(x is not None for x in (t1, t2, t3)))
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_count_matches_bruteforce(spark, raw_edges):
    """Degree-oriented wedge counting must equal the brute-force
    all-triples scan on small random graphs (self-loops and multi-edges
    in the input must be ignored)."""
    from itertools import combinations

    from pdcm_etl_spark.operators.graph import triangle_count

    df = spark.createDataFrame(raw_edges, "src bigint, dst bigint").repartition(3)
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(df).collect()
    }
    adj = {tuple(sorted(e)) for e in raw_edges if e[0] != e[1]}
    nodes = sorted({n for e in adj for n in e})
    want: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in adj) and ((x, z) in adj) and ((y, z) in adj):
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # series key
            st.integers(min_value=0, max_value=15),      # day offset
            st.integers(min_value=-5, max_value=5),      # integral value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_gapfill_daily_matches_python_fold(spark, evs):
    """Calendar densification + forward fill must equal a per-series
    Python scan: every day in [min, max] present, counts zero-filled,
    micro sums carried forward."""
    import datetime

    from pdcm_etl_spark.operators.temporal import gapfill_daily

    base = datetime.datetime(2024, 1, 1)
    epoch0 = (base.date() - datetime.date(1970, 1, 1)).days
    rows = [
        (f"k{k}", base + datetime.timedelta(days=d, hours=1), float(v))
        for k, d, v in evs
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    ).repartition(3)
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["filled_value_micro"])
        for r in gapfill_daily(df).collect()
    }
    want = {}
    for key in {r[0] for r in rows}:
        days = {}
        for k, ts, v in rows:
            if k == key:
                d = epoch0 + (ts.date() - base.date()).days
                n, s = days.get(d, (0, 0))
                days[d] = (n + 1, s + int(v * 1_000_000))
        last = None
        for d in range(min(days), max(days) + 1):
            if d in days:
                last = days[d][1]
                want[(key, d)] = (days[d][0], last)
            else:
                want[(key, d)] = (0, last)
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),        # group
            st.integers(min_value=-1000, max_value=1000), # metric
        ),
        min_size=1,
        max_size=40,
    )
)
def test_iqr_outliers_matches_python(spark, rows):
    """Discrete-quartile Tukey fences must equal the Python formula
    (q1 at ceil(n/4), q3 at ceil(3n/4), id tie-break, k=3)."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.ml import iqr_outliers

    data = [(i, f"g{g}", m) for i, (g, m) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, grp string, m bigint").repartition(3)
    got = {
        r["id"]: (r["q1_micro"], r["q3_micro"])
        for r in iqr_outliers(
            df, key_col="grp", id_col="id", value_micro=F.col("m"), k_iqr=3
        ).collect()
    }
    want = {}
    for g in {d[1] for d in data}:
        grp = sorted((m, i) for i, gg, m in data if gg == g)
        n = len(grp)
        q1 = grp[(n + 3) // 4 - 1][0]
        q3 = grp[(3 * n + 3) // 4 - 1][0]
        for m, i in grp:
            if m > q3 + 3 * (q3 - q1) or m < q1 - 3 * (q3 - q1):
                want[i] = (q1, q3)
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    """The bucketed prefix-min skyline must equal the O(n²) dominance
    scan, including duplicate points and the cross-bucket carry path
    (n_buckets=3 forces it)."""
    from pdcm_etl_spark.operators.analytics import pareto_frontier

    df = spark.createDataFrame(pts, "x bigint, y bigint").repartition(3)
    got = {
        (r["x"], r["y"]): r["n_rows"]
        for r in pareto_frontier(df, "x", "y", n_buckets=3).collect()
    }
    from collections import Counter

    mult = Counter(pts)
    want = {
        (x, y): c
        for (x, y), c in mult.items()
        if not any(
            bx <= x and by <= y and (bx < x or by < y) for bx, by in mult
        )
    }
    assert got == want


@SLOW
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), min_size=3, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_containment_pairs_matches_python_sets(spark, docs):
    """Integer-ppm containment over guarded shingle candidates must equal
    the Python set formula for every pair sharing a shingle."""
    from pdcm_etl_spark.operators.dedup import containment_pairs, shingles

    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(3)
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["cont_a_ppm"], r["cont_b_ppm"])
        for r in containment_pairs(
            shingles(df), min_ppm=0, max_shingle_freq=None
        ).collect()
    }
    def sh(toks):
        return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh(docs[a]) & sh(docs[b]))
            if inter:
                want[(a, b)] = (
                    inter,
                    1_000_000 * inter // len(sh(docs[a])),
                    1_000_000 * inter // len(sh(docs[b])),
                )
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),       # user
            st.integers(min_value=0, max_value=40_000),  # ts seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_batch_matches_python_scan(spark, evs):
    """Window-based sessionization must equal a per-user sequential scan
    with the same 30-min gap rule."""
    import datetime

    from pdcm_etl_spark.operators.temporal import sessionize

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, u, base + datetime.timedelta(seconds=s), 1.0)
        for i, (u, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    ).repartition(3)
    got = {
        (r["user_id"], r["session_seq"]): (
            r["start_ts"], r["end_ts"], r["n_events"]
        )
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    want = {}
    for u in {r[1] for r in rows}:
        hist = sorted((ts, i) for i, uu, ts, _v in rows if uu == u)
        seq = 0
        prev = None
        cur: list = []
        for ts, _i in hist:
            if prev is None or (ts - prev).total_seconds() > 1800:
                if cur:
                    want[(u, seq)] = (cur[0], cur[-1], len(cur))
                seq += 1
                cur = []
            cur.append(ts)
            prev = ts
        want[(u, seq)] = (cur[0], cur[-1], len(cur))
    assert got == want


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=10),
)
def test_bloom_semi_join_exact_even_at_high_fpr(spark, fact_keys, key_set):
    """The bloom prune must never lose a true match, and the exact
    semi-join must scrub every false positive — stress with a 64-bit
    filter (massive FPR) so both properties actually bite."""
    from pdcm_etl_spark.functions.joins import bloom_semi_join

    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "row_id bigint, k bigint"
    ).repartition(3)
    keys = spark.createDataFrame(
        [(k,) for k in key_set] or [(-(10 ** 9),)], "kk bigint"
    )
    got = sorted(
        r["row_id"]
        for r in bloom_semi_join(fact, keys, "k", "kk", num_bits=64).collect()
    )
    want = sorted(i for i, k in enumerate(fact_keys) if k in set(key_set))
    assert got == want


# ---------------------------------------------------------------------------
# BMP codec (round 5: the multimodal decode stub is retired)
# ---------------------------------------------------------------------------


def test_bmp_codec_roundtrip_exact():
    """encode → decode must return the exact pixel sequence in top-down
    row-major order, for padded (w*3 % 4 != 0) and unpadded widths."""
    from pdcm_etl_spark.operators.multimodal import _bmp_decode, _bmp_encode

    for w, h in [(8, 8), (3, 5), (5, 3), (1, 1), (7, 2)]:
        px = [(i * 37 + 11) % 256 for i in range(w * h)]
        blob = _bmp_encode(px, w, h)
        assert blob[:2] == b"BM"
        dw, dh, bpp, out = _bmp_decode(blob)
        assert (dw, dh, bpp) == (w, h, 24)
        assert out == px
        # declared file size in the header matches reality
        import struct
        assert struct.unpack_from("<I", blob, 2)[0] == len(blob)


def test_bmp_decode_rejects_non_bmp():
    import pytest as _pytest

    from pdcm_etl_spark.operators.multimodal import _bmp_decode

    with _pytest.raises(ValueError):
        _bmp_decode(b"PNG\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00")


def test_text_pixels_matches_oracle_rule():
    from pdcm_etl_spark.operators.multimodal import text_pixels

    assert text_pixels("", 4) == [0, 0, 0, 0]
    assert text_pixels("ab", 5) == [97, 98, 97, 98, 97]
    # non-ASCII: codepoint mod 256, char-wise like DuckDB ord(substr())
    assert text_pixels("é", 2) == [0xE9, 0xE9]


def test_bmp_kernels_pickle_by_value():
    """The codec helpers must serialize BY VALUE (nested-function
    qualnames) — a module-level helper would need pdcm_etl_spark
    importable on Python workers, which the external driver does not
    guarantee (round-5 regression: ModuleNotFoundError in the gate)."""
    import pickle

    import cloudpickle

    from pdcm_etl_spark.operators import multimodal as mm

    for fn in (mm._bmp_encode, mm._bmp_decode, mm.text_pixels):
        # nested qualname → cloudpickle's lookup-by-qualname fails and
        # it falls back to by-value serialization (the blob still names
        # the module in __module__ metadata, which is fine — nothing is
        # imported at load time)
        assert "<locals>" in fn.__qualname__
        blob = cloudpickle.dumps(fn)
        assert pickle.loads(blob) is not None
    enc = pickle.loads(cloudpickle.dumps(mm._bmp_encode))
    assert enc([0] * 4, 2, 2)[:2] == b"BM"


@SLOW
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=14),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([150_000, 300_000, 500_000, 900_000]),
)
def test_prefix_filter_pairs_matches_bruteforce(spark, docs, t_ppm):
    """Prefix filtering is EXACT: for every threshold, the candidate
    prefix buckets + length filter + verify must reproduce the
    brute-force all-pairs Jaccard exactly — including duplicate balls
    (identical docs), frequency ties in the global rarity order, and
    docs too short to shingle. Misses here mean the prefix-length
    arithmetic (|X| - ceil(t|X|) + 1) or the rarity ordering is off."""
    from pdcm_etl_spark.operators.dedup import prefix_filter_pairs, shingles

    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(3)
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["jaccard_ppm"])
        for r in prefix_filter_pairs(shingles(df), min_ppm=t_ppm).collect()
    }

    def sh(toks):
        return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = sh(docs[a]), sh(docs[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            jac = 1_000_000 * inter // union
            if jac >= t_ppm:
                want[(a, b)] = (inter, jac)
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # domain
            st.integers(min_value=0, max_value=9999),   # quality
            st.integers(min_value=1, max_value=50),     # tokens
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=400),             # budget
    st.sampled_from([1, 7, 100, 10000]),                 # bucket width
)
def test_token_budget_select_matches_python_greedy(spark, rows, budget, qb):
    """The two-level running sum must equal the per-domain greedy scan
    for every bucket width — including widths of 1 (every row its own
    bucket) and widths larger than the quality range (one bucket: the
    naive window), quality ties, and budget 0."""
    from pdcm_etl_spark.operators.sampling import token_budget_select

    data = [(f"d{d}", i, q, t) for i, (d, q, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "domain string, id bigint, q bigint, t bigint"
    ).repartition(3)
    got = {
        (r["domain"], r["id"]): r["cum_tokens"]
        for r in token_budget_select(
            df, "domain", "q", "t", "id", budget, quality_bucket=qb
        ).collect()
    }
    want = {}
    bydom: dict[str, list] = {}
    for dom, i, q, t in data:
        bydom.setdefault(dom, []).append((i, q, t))
    for dom, rs in bydom.items():
        cum = 0
        for i, q, t in sorted(rs, key=lambda r: (-r[1], r[0])):
            cum += t
            if cum <= budget:
                want[(dom, i)] = cum
    assert got == want


@SLOW
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),          # key
        st.one_of(st.none(), st.text(max_size=3)),       # old value
        max_size=12,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.one_of(st.none(), st.text(max_size=3)),
        max_size=12,
    ),
)
def test_snapshot_diff_matches_python_dict_diff(spark, old, new):
    """added/removed/changed must equal the dict diff — including NULL
    values (the chr(0) encoding must keep NULL distinct from '' and
    from the literal NUL string) and keys present in both with equal
    values (emitted by neither)."""
    from pdcm_etl_spark.operators.cdc import snapshot_diff

    o = spark.createDataFrame(
        list(old.items()) or [(None, None)], "k bigint, v string"
    ).filter("k IS NOT NULL")
    n = spark.createDataFrame(
        list(new.items()) or [(None, None)], "k bigint, v string"
    ).filter("k IS NOT NULL")
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(o, n, ["k"]).collect()
    }
    want = {}
    for k in old.keys() | new.keys():
        if k not in new:
            want[k] = "removed"
        elif k not in old:
            want[k] = "added"
        elif old[k] != new[k]:
            want[k] = "changed"
    assert got == want


@SLOW
@given(
    st.lists(st.text(alphabet="abc", max_size=4), min_size=1, max_size=25),
    st.sampled_from([2, 3, 5, 8]),       # window
    st.sampled_from([1, 2, 10]),         # bucket_len
)
def test_sorted_neighborhood_matches_global_rank(spark, keys, w, blen):
    """The bucketed rank decomposition + exactly-once block pairing
    must equal the naive global ROW_NUMBER self-join for any bucket
    depth — including depth 1 (coarse buckets), depths past the key
    length (every distinct key its own bucket), duplicate keys, and
    empty-string keys."""
    from pdcm_etl_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(3)
    got = {
        (r["id_a"], r["id_b"]): r["rank_gap"]
        for r in sorted_neighborhood_pairs(
            df, "id", "k", window=w, bucket_len=blen
        ).collect()
    }
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + w, len(ranked))):
            want[(ranked[i][0], ranked[j][0])] = j - i
    assert got == want


def test_wav_codec_roundtrip_exact():
    """encode → decode must return the exact int16 sample sequence and
    sample rate, and the RIFF size field must match reality — including
    extremes, zeros, and odd sample counts (word-aligned data chunk)."""
    import struct

    from pdcm_etl_spark.operators.multimodal import _wav_decode, _wav_encode

    for ss in (
        [0, 1, -1, 32767, -32768],
        [0] * 7,                      # odd count → padded data chunk
        [(i * 257 - 32768) for i in range(256)],
        [5],
    ):
        blob = _wav_encode(ss, 16000)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        assert struct.unpack_from("<I", blob, 4)[0] == len(blob) - 8
        rate, out = _wav_decode(blob)
        assert rate == 16000
        assert out == ss


def test_wav_decode_walks_unknown_chunks():
    """A LIST chunk (or any unknown chunk) before fmt/data must be
    skipped by the chunk walk — the case a fixed-offset reader fails."""
    import struct

    from pdcm_etl_spark.operators.multimodal import _wav_decode, _wav_encode

    blob = _wav_encode([3, -4, 5], 8000)
    # splice an unknown 6-byte chunk (odd size → 1 pad byte) after WAVE
    junk = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = blob[:12] + junk + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, out = _wav_decode(spliced)
    assert rate == 8000 and out == [3, -4, 5]


def test_wav_decode_rejects_non_wav_and_non_pcm():
    import struct

    import pytest as _pytest

    from pdcm_etl_spark.operators.multimodal import _wav_decode

    with _pytest.raises(ValueError):
        _wav_decode(b"OggS\x00\x00\x00\x00\x00\x00\x00\x00\x00")
    # stereo fmt chunk → rejected
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
    data = struct.pack("<4sI", b"data", 0)
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    with _pytest.raises(ValueError):
        _wav_decode(riff + fmt + data)


def test_text_samples_matches_oracle_rule():
    from pdcm_etl_spark.operators.multimodal import text_samples

    assert text_samples("", 3) == [0, 0, 0]
    # 'a' = 97 → 97*257 - 32768 = -7839; spans int16 exactly at extremes
    assert text_samples("a", 2) == [-7839, -7839]
    assert text_samples(chr(0), 1) == [-32768]
    assert text_samples(chr(255), 1) == [32767]


def test_wav_kernels_pickle_by_value():
    """Same by-value rule as the BMP kernels: nested qualnames force
    cloudpickle to serialize the codec by value, so Python workers never
    need pdcm_etl_spark on their sys.path."""
    import pickle

    import cloudpickle

    from pdcm_etl_spark.operators import multimodal as mm

    for fn in (mm._wav_encode, mm._wav_decode, mm.text_samples):
        assert "<locals>" in fn.__qualname__
        assert pickle.loads(cloudpickle.dumps(fn)) is not None
    enc = pickle.loads(cloudpickle.dumps(mm._wav_encode))
    assert enc([1, -2], 8000)[:4] == b"RIFF"


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user
            st.integers(min_value=0, max_value=50),  # ts
            st.integers(min_value=0, max_value=3),   # type
        ),
        min_size=1,
        max_size=30,
    )
)
def test_event_transitions_matches_python_scan(spark, evs):
    """The lead()-window transition counts must equal a per-user
    sequential scan over the (ts, id)-ordered stream — including
    timestamp ties (id breaks them), single-event users (no
    transitions), and self-loops."""
    import datetime

    from pdcm_etl_spark.operators.temporal import event_transitions

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, t), u, f"e{ty}", 0.0, "")
        for i, (u, t, ty) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).repartition(3)
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["share_ppm"])
        for r in event_transitions(df).collect()
    }
    byuser: dict[int, list] = {}
    for i, (u, t, ty) in enumerate(evs):
        byuser.setdefault(u, []).append((t, i, f"e{ty}"))
    counts: dict[tuple, int] = {}
    for seq in byuser.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    outs: dict[str, int] = {}
    for (a, _), n in counts.items():
        outs[a] = outs.get(a, 0) + n
    want = {
        (a, b): (n, 1_000_000 * n // outs[a]) for (a, b), n in counts.items()
    }
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=30,
    ),
    st.sampled_from([2, 3]),
)
def test_kcore_matches_python_peeling(spark, edges, k):
    """Distributed peeling must equal the sequential algorithm —
    including self-loops (dropped), parallel edges (deduped), graphs
    that peel to empty, and cores reached after several cascading
    rounds."""
    from pdcm_etl_spark.operators.graph import kcore

    edf = (
        spark.createDataFrame(list(edges), ["src", "dst"])
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    got = {r["node"]: r["degree"] for r in kcore(edf, k=k).collect()}

    adj: dict[int, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m_ in adj[n]:
                    adj[m_].discard(n)
                del adj[n]
                changed = True
    want = {n: len(ns) for n, ns in adj.items()}
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),              # key
            st.integers(-100, 100),         # metric
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([1, 3]),
)
def test_mad_outliers_matches_python(spark, rows, k):
    """MAD flags must equal the sequential computation — discrete
    medians at position ceil(n/2) tie-broken by id, including all-equal
    groups (mad 0: everything off-median flags) and negative metrics."""
    from pdcm_etl_spark.operators.ml import mad_outliers

    data = [(i, f"k{g}", m) for i, (g, m) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, key string, m bigint")
    got = {
        r["id"]: (r["med_micro"], r["mad_micro"])
        for r in mad_outliers(
            df, "key", "id", F.col("m"), k_mad=k
        ).collect()
    }
    bykey: dict[str, list] = {}
    for i, g, m in data:
        bykey.setdefault(g, []).append((m, i))
    want = {}
    for g, ms in bykey.items():
        n = len(ms)
        med = sorted(ms)[(n + 1) // 2 - 1][0]
        devs = sorted((abs(m - med), i) for m, i in ms)
        mad = devs[(n + 1) // 2 - 1][0]
        for m, i in ms:
            if abs(m - med) > k * mad:
                want[i] = (med, mad)
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1,
        max_size=25,
    )
)
def test_target_encode_loo_matches_python(spark, rows):
    """Pure leave-one-out encoding must equal the per-row computation —
    singleton categories fall back to the global LOO mean, a lone row
    overall encodes 0, and no row's own target leaks into its code."""
    from pdcm_etl_spark.operators.ml import target_encode_loo

    data = [(i, f"c{c}", t) for i, (c, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, cat string, t bigint")
    got = {
        r["id"]: r["enc_micro"]
        for r in target_encode_loo(
            df, "cat", "id", F.col("t"), prior_weight=0
        ).collect()
    }
    bycat: dict[str, list] = {}
    for i, c, t in data:
        bycat.setdefault(c, []).append(t)
    g_sum = sum(t for _, _, t in data)
    g_n = len(data)
    want = {}
    for i, c, t in data:
        ts = bycat[c]
        if len(ts) > 1:
            want[i] = (sum(ts) - t) // (len(ts) - 1)
        elif g_n > 1:
            want[i] = (g_sum - t) // (g_n - 1)
        else:
            want[i] = 0
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
        min_size=2,
        max_size=25,
    )
)
def test_spearman_corr_matches_python(spark, pts):
    """The exact-rational rho must equal the Python computation with
    the same tie-broken ranks — including perfectly correlated (1e6),
    anti-correlated, and constant columns."""
    from pdcm_etl_spark.operators.ml import spearman_corr_ppm

    data = [(i, "g", x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(data, "id bigint, key string, x bigint, y bigint")
    row = spearman_corr_ppm(
        df, "key", F.col("x"), F.col("y"), "id"
    ).collect()[0]
    rx = {i: r + 1 for r, (_, i) in enumerate(sorted((x, i) for i, _, x, _ in data))}
    ry = {i: r + 1 for r, (_, i) in enumerate(sorted((y, i) for i, _, _, y in data))}
    n = len(data)
    sd2 = sum((rx[i] - ry[i]) ** 2 for i, *_ in data)
    want = 1_000_000 - (6 * sd2 * 1_000_000) // (n * (n * n - 1))
    assert row["rho_ppm"] == want and row["n"] == n


def test_rolling_aggregate_id_col_parameterized(spark):
    # r5 advice: output projection hardcoded "event_id"; any input
    # lacking that column failed analysis despite valid arguments
    from pdcm_etl_spark.operators.temporal import rolling_aggregate

    df = spark.createDataFrame(
        [("r1", "u1", "2024-01-01 00:00:00", 1.0),
         ("r2", "u1", "2024-01-01 00:30:00", 2.0),
         ("r3", "u2", "2024-01-01 02:00:00", 3.0)],
        "row_id string, uid string, ts string, value double",
    )
    out = rolling_aggregate(
        df, key_col="uid", ts_col="ts", value_col="value",
        window_seconds=3600, id_col="row_id",
    )
    rows = {r["row_id"]: r for r in out.collect()}
    assert set(rows) == {"r1", "r2", "r3"}
    assert rows["r2"]["roll_events"] == 2
    assert rows["r2"]["roll_value_micro"] == 3_000_000
    assert rows["r3"]["roll_events"] == 1


def test_gini_known_distributions(spark):
    from pdcm_etl_spark.operators.analytics import gini_concentration

    # perfect equality -> 0; total concentration -> (n-1)/n
    eq = spark.createDataFrame(
        [("a", i, 10) for i in range(5)], "k string, id int, v int"
    )
    conc = spark.createDataFrame(
        [("b", 0, 100)] + [("b", i, 0) for i in range(1, 5)],
        "k string, id int, v int",
    )
    out = {
        r["key"]: r["gini_ppm"]
        for r in gini_concentration(
            eq.unionByName(conc), "k", "v", "id"
        ).collect()
    }
    assert out["a"] == 0
    assert out["b"] == 800_000  # (n-1)/n = 4/5


def test_linreg_recovers_exact_line(spark):
    from pdcm_etl_spark.operators.analytics import linreg_group

    # y = 3x + 7 exactly -> slope_ppm = 3e6, intercept_milli = 7e3
    df = spark.createDataFrame(
        [("g", x, 3 * x + 7) for x in range(1, 20)],
        "k string, x int, y int",
    )
    row = linreg_group(df, "k", "x", "y").collect()[0]
    assert row["slope_ppm"] == 3_000_000
    assert row["intercept_milli"] == 7_000
    # zero x-variance -> NULL slope (the SQL-natural contract)
    flat = spark.createDataFrame(
        [("f", 2, y) for y in range(5)], "k string, x int, y int"
    )
    row = linreg_group(flat, "k", "x", "y").collect()[0]
    assert row["slope_ppm"] is None


def test_chi_square_independent_table_is_zero(spark):
    from pdcm_etl_spark.operators.analytics import chi_square_assoc

    # perfectly independent 2x2 (all margins equal) -> chi2 == 0
    rows = [("a", "x")] * 10 + [("a", "y")] * 10 + \
           [("b", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_assoc(df, "r", "c").collect()[0]
    assert out["chi2_milli"] == 0
    assert out["deg_freedom"] == 1
    assert out["total"] == 40


def test_bfs_distances_on_path_graph(spark):
    from pdcm_etl_spark.operators.graph import bfs_distances

    # path 0-1-2-...-9, source 0, max_hops 4 -> dists 0..4, rest absent
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    src = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["dist"] for r in
           bfs_distances(edges, src, max_hops=4).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    # directed mode must not walk edges backwards
    out_dir = {r["node"]: r["dist"] for r in
               bfs_distances(edges, spark.createDataFrame([(5,)], "node long"),
                             max_hops=3, directed=True).collect()}
    assert out_dir == {5: 0, 6: 1, 7: 2, 8: 3}


def test_weighted_sample_margin_and_bias(spark, sf_dir):
    """The A-ES selection must be robust to libm 1-ulp divergence: the
    gap between the k-th and (k+1)-th exponential clocks at gate scale
    must dwarf 1e-12 relative. And the sampler must actually BIAS
    toward weight: the mean sampled length exceeds the corpus mean."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.dedup import portable_hash60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = portable_hash60(F.col("doc_id").cast("string"))
    u = (h % F.lit(1 << 30) + 1) / F.lit(float((1 << 30) + 1))
    clocks = sorted(
        r[0]
        for r in docs.filter(F.col("n_chars") > 0)
        .select((-F.log(u) / F.col("n_chars").cast("double")).alias("c"))
        .collect()
    )
    k = 200
    if len(clocks) > k:
        gap = (clocks[k] - clocks[k - 1]) / clocks[k - 1]
        assert gap > 1e-9, f"selection boundary too tight: {gap}"

    from pdcm_etl_spark.operators.sampling import weighted_sample

    samp = weighted_sample(docs, "doc_id", "n_chars", k=min(k, 50))
    mean_s = samp.agg(F.avg("n_chars")).first()[0]
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    assert mean_s > mean_all


def test_bigram_lm_exact_small_doc(spark):
    from pdcm_etl_spark.operators.text import bigram_lm_score

    # doc1 "a b a b a": bigrams ab,ba,ab,ba; doc2 "a c": bigram ac
    # c1(a)=3 (ab,ab,ac), c1(b)=2 -> P(b|a)=2e6 div 3, P(a|b)=1e6,
    # P(c|a)=1e6 div 3
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    p_ab, p_ac = 2_000_000 // 3, 1_000_000 // 3
    assert out[1]["n_bigrams"] == 4
    assert out[1]["lm2_score_ppm"] == (2 * p_ab + 2 * 1_000_000) // 4
    assert out[1]["min_cond_ppm"] == p_ab
    assert out[2]["n_bigrams"] == 1
    assert out[2]["lm2_score_ppm"] == p_ac
    assert 3 not in out  # single-word doc has no bigrams


def test_quantile_normalize_equalizes_groups(spark):
    from pdcm_etl_spark.operators.ml import quantile_normalize

    # two equal-size groups with different scales: after normalization
    # both carry the SAME multiset of q_values (the defining property)
    rows = [("g1", i, v) for i, v in enumerate([1, 2, 3, 4])] + [
        ("g2", 10 + i, v) for i, v in enumerate([100, 200, 300, 400])
    ]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    out = quantile_normalize(df, "g", "v", "id")
    g1 = sorted(r["q_value"] for r in out.filter("g = 'g1'").collect())
    g2 = sorted(r["q_value"] for r in out.filter("g = 'g2'").collect())
    assert g1 == g2
    # type-1 order stats: idx = ceil(r*8/4) = 2,4,6,8 -> global sorted
    # [1,2,3,4,100,200,300,400] positions -> [2,4,200,400]
    assert g1 == [2, 4, 200, 400]


def test_linkage_score_pairs_weights_and_threshold(spark):
    from pdcm_etl_spark.operators.dedup import linkage_score_pairs

    attrs = spark.createDataFrame(
        [(1, "US", 100), (2, "US", 150), (3, "DE", 900)],
        "id long, country string, bal long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = linkage_score_pairs(
        pairs, attrs, "id",
        exact_rules=[("country_eq", "country", 10)],
        tol_rules=[("bal_close", "bal", 100, 5)],
        threshold=15,
    )
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert set(rows) == {(1, 2)}  # (1,3): 0 + 0 < 15
    assert rows[(1, 2)]["score"] == 15
    assert rows[(1, 2)]["country_eq"] and rows[(1, 2)]["bal_close"]


def test_dedup_recall_lsh_subset_of_truth(spark, sf_dir):
    # LSH-verified pairs verify with exact Jaccard at the SAME threshold
    # as the candidate-complete truth, so found ⊆ truth: n_hit ==
    # n_lsh_pairs and recall_ppm ∈ [0, 1e6]
    import __spark_entry__ as e

    row = e.queries()["dedup_recall"](spark, sf_dir).collect()[0]
    assert row["n_hit"] == row["n_lsh_pairs"]
    assert row["n_true_pairs"] >= row["n_hit"]
    if row["n_true_pairs"]:
        assert 0 <= row["recall_ppm"] <= 1_000_000


def test_weighted_sample_grouped_k_per_group_and_bias(spark, sf_dir):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.sampling import weighted_sample_grouped

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_sample_grouped(docs, "lang", "doc_id", "n_chars", k=5)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.filter("n_chars > 0").groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for g, n in per.items():
        assert n == min(5, sizes[g])


def test_join_cardinality_estimate_matches_actual_join(spark, sf_dir):
    from pdcm_etl_spark.functions.joins import join_cardinality_estimate

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = join_cardinality_estimate(
        orders, li, "o_orderkey", "l_orderkey"
    ).collect()[0]
    actual = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert row["join_rows"] == actual
    assert row["max_key_rows"] <= row["join_rows"]
    assert row["n_common_keys"] <= row["left_rows"]


def test_banding_recall_sampled_mode(spark, sf_dir):
    # the production sample knob: sampled recall is still a valid ratio
    # and both pipelines run on the same sub-corpus
    from pdcm_etl_spark.operators.dedup import banding_recall

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = banding_recall(docs, min_ppm=200_000, sample_bp=5000).collect()[0]
    assert row["n_hit"] == row["n_lsh_pairs"]
    if row["n_true_pairs"]:
        assert 0 <= row["recall_ppm"] <= 1_000_000


def test_grouped_quantiles_exact_positions(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.ml import grouped_quantiles

    # 100 rows valued 1..100: q-th percentile picks exactly value q
    df = spark.createDataFrame(
        [("g", i, i) for i in range(1, 101)], "k string, id int, v int"
    )
    row = grouped_quantiles(
        df, "k", "id", F.col("v").cast("bigint")
    ).collect()[0]
    assert (row["q25_micro"], row["q50_micro"], row["q75_micro"],
            row["q90_micro"]) == (25, 50, 75, 90)
    assert row["n"] == 100
    # n=1: every quantile is the single value
    one = spark.createDataFrame([("s", 1, 7)], "k string, id int, v int")
    r1 = grouped_quantiles(one, "k", "id", F.col("v").cast("bigint")).collect()[0]
    assert all(r1[f"q{q}_micro"] == 7 for q in (25, 50, 75, 90))


def test_event_path_topk_counts_paths(spark):
    from pdcm_etl_spark.operators.temporal import event_path_topk

    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:01:00", 1, "b"),
        (3, "2024-01-01 00:02:00", 1, "c"),
        (4, "2024-01-01 00:03:00", 1, "a"),
        (5, "2024-01-01 00:00:00", 2, "a"),
        (6, "2024-01-01 00:01:00", 2, "b"),
        (7, "2024-01-01 00:02:00", 2, "c"),
        (8, "2024-01-01 00:00:00", 3, "x"),  # too short for a trigram
        (9, "2024-01-01 00:01:00", 3, "y"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    out = {r["path"]: r["n_occurrences"]
           for r in event_path_topk(df, n=3, k=10).collect()}
    assert out == {"a>b>c": 2, "b>c>a": 1}


def test_grouped_moments_exact_known_values(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.analytics import grouped_moments

    # values 2,4,6,8: mean 5, m2 = 9+1+1+9 = 20, var = 5
    df = spark.createDataFrame(
        [("g", v) for v in (2, 4, 6, 8)], "k string, v int"
    )
    row = grouped_moments(df, "k", F.col("v").cast("bigint")).collect()[0]
    assert (row["n"], row["min_micro"], row["max_micro"]) == (4, 2, 8)
    assert row["mean_micro"] == 5
    assert row["var_micro2"] == 5  # m2 = 9+1+1+9 = 20, div 4
    assert row["var_sample_micro2"] == 6  # 20 div 3
    # integer-mean floor: values 1,2 -> mean 1, m2 = 0+1 = 1
    df2 = spark.createDataFrame([("h", 1), ("h", 2)], "k string, v int")
    r2 = grouped_moments(df2, "k", F.col("v").cast("bigint")).collect()[0]
    assert r2["mean_micro"] == 1 and r2["var_micro2"] == 0
    assert r2["var_sample_micro2"] == 1


def test_ivf_persisted_serve_equals_inline_trained(spark):
    # persisted-serve ≡ inline-trained: centroid doubles round-trip
    # parquet bit-exactly and the serve math is the same expression
    # tree, so the two registry paths must agree row-for-row
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()
    a = sorted(map(tuple, qs["ann_ivf_persisted"](spark, sf).collect()))
    b = sorted(map(tuple, qs["ann_ivf_trained_topk"](spark, sf).collect()))
    assert a == b


def test_banding_recall_sampled_brackets_full(spark):
    # the production sample_bp knob (operators/dedup.py banding_recall):
    # recall is a ratio, so measuring it on a deterministic hash-sample
    # of documents must land near the full-corpus value. min_ppm=100k on
    # the sf0.1 corpus makes the property NON-trivial (full recall
    # 984615 ppm — LSH at 8 bands misses some sub-threshold-sim true
    # pairs); both sampled measurements must sit within ±5 pp.
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        _pytest.skip("sf0.1 not present")
    from pdcm_etl_spark.operators.dedup import banding_recall

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    full = banding_recall(docs, min_ppm=100_000).collect()[0]
    assert full["recall_ppm"] < 1_000_000  # non-trivial corpus/threshold
    for bp in (5000, 2500):
        s = banding_recall(docs, min_ppm=100_000, sample_bp=bp).collect()[0]
        assert s["n_true_pairs"] < full["n_true_pairs"]  # really sampled
        assert abs(s["recall_ppm"] - full["recall_ppm"]) <= 50_000, (
            bp, s["recall_ppm"], full["recall_ppm"],
        )


def test_grouped_auc_known_exact_values(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.ml import grouped_auc_ppm

    # perfect separation: every positive scores above every negative
    rows = [("g", 10 + i, 1) for i in range(5)] + [
        ("g", i, 0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, s int, y int")
    r = grouped_auc_ppm(
        df, "k", F.col("s").cast("bigint"), F.col("y") == 1
    ).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (5, 5, 1_000_000)
    # total inversion -> 0; all-tied scores -> exactly 500000
    inv = grouped_auc_ppm(
        df, "k", F.col("s").cast("bigint"), F.col("y") == 0
    ).collect()[0]
    assert inv["auc_ppm"] == 0
    tied = spark.createDataFrame(
        [("g", 7, i % 2) for i in range(8)], "k string, s int, y int"
    )
    t = grouped_auc_ppm(
        tied, "k", F.col("s").cast("bigint"), F.col("y") == 1
    ).collect()[0]
    assert t["auc_ppm"] == 500_000
    # degenerate group (no negatives) -> NULL
    onecls = spark.createDataFrame(
        [("g", i, 1) for i in range(3)], "k string, s int, y int"
    )
    assert grouped_auc_ppm(
        onecls, "k", F.col("s").cast("bigint"), F.col("y") == 1
    ).collect()[0]["auc_ppm"] is None


def test_ks_drift_known_exact_values(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.analytics import ks_drift

    # disjoint ranges -> D = 1 exactly
    rows = [(i, i, 0) for i in range(10)] + [
        (100 + i, 100 + i, 1) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "m int, id int, a int")
    r = ks_drift(
        df, F.col("m").cast("bigint"), F.col("a") == 1, "id"
    ).collect()[0]
    assert (r["n_before"], r["n_after"], r["ks_ppm"]) == (10, 10, 1_000_000)
    # identical multisets -> D = 0 exactly (ties resolved after groups)
    rows2 = [(v, i, i % 2) for i, v in enumerate([1, 1, 2, 2, 3, 3, 4, 4])]
    df2 = spark.createDataFrame(rows2, "m int, id int, a int")
    r2 = ks_drift(
        df2, F.col("m").cast("bigint"), F.col("a") == 1, "id"
    ).collect()[0]
    assert r2["ks_ppm"] == 0
    # empty / all-null input -> ZERO rows, contract schema intact
    # (matches the SQL oracle, whose value x total cross join is empty)
    df3 = spark.createDataFrame([], "m int, id int, a int")
    r3 = ks_drift(df3, F.col("m").cast("bigint"), F.col("a") == 1, "id")
    assert r3.count() == 0
    assert [f.name for f in r3.schema.fields] == [
        "n_before", "n_after", "ks_ppm",
    ]


def test_attribution_position_conserves_revenue_exactly(spark):
    """U-shaped credits must re-sum to the converting sessions' total
    conversion revenue BIT-FOR-BIT — the remainder discipline (middle
    pool = exact leftover; its remainder to the earliest middle touch)
    is what makes multi-touch attribution auditable."""
    import datetime

    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.temporal import attribution_position

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, i, typ, val):
        return (uid, t0 + datetime.timedelta(seconds=10 * i), i, typ, val)

    rows = [
        # user 1: 4 touches then purchase of 10.000001 -> 40/20/40 with
        # middle remainder pinned to the earliest middle touch
        ev(1, 1, "view", None), ev(1, 2, "click", None),
        ev(1, 3, "view", None), ev(1, 4, "click", None),
        ev(1, 5, "purchase", 10.000001),
        # user 2: single touch takes everything
        ev(2, 1, "click", None), ev(2, 2, "purchase", 5.5),
        # user 3: two touches -> ceil/floor split of an odd micro total
        ev(3, 1, "view", None), ev(3, 2, "click", None),
        ev(3, 3, "purchase", 0.000003),
        # user 4: direct conversion (no prior touch)
        ev(4, 1, "purchase", 7.25),
        # user 5: no conversion -> no credit at all
        ev(5, 1, "view", None), ev(5, 2, "click", None),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint,"
        " event_type string, value double"
    )
    out = {
        r["touch_type"]: (r["n_touches"], r["credit_micro"])
        for r in attribution_position(df).collect()
    }
    total_credit = sum(c for _, c in out.values())
    assert total_credit == 10_000_001 + 5_500_000 + 3 + 7_250_000
    # user 1: first 4000000, last 4000000, middle pool 2000001 ->
    # each 1000000, remainder 1 to the EARLIEST middle touch (click@2)
    # user 2: click 5500000; user 3: view ceil=2, click floor=1
    assert out["direct"] == (1, 7_250_000)
    # view: u1 first@1 = 4000000, u1 middle@3 = 1000000, u3 ceil = 2
    assert out["view"] == (3, 4_000_000 + 1_000_000 + 2)
    # click: u1 middle@2 = 1000000+1 (remainder), u1 last@4 = 4000000,
    # u2 single = 5500000, u3 floor = 1
    assert out["click"] == (4, 1_000_001 + 4_000_000 + 5_500_000 + 1)


def test_grouped_gain_curve_known_exact_values(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.ml import grouped_gain_curve

    # one group, 10 rows, scores 10..1, positives at the top 3 scores
    rows = [("g", i, 11 - i, 1 if i <= 3 else 0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "key string, id int, s int, y int")
    out = {
        r["bucket"]: (r["n_rows"], r["n_pos"], r["cum_pos"],
                      r["gain_ppm"], r["lift_ppm"])
        for r in grouped_gain_curve(
            df, "key", "id", F.col("s").cast("bigint"), F.col("y") == 1
        ).collect()
    }
    # 10 rows / 10 buckets -> 1 row per bucket; positives are ranks 1-3
    assert len(out) == 10
    assert out[1] == (1, 1, 1, 333_333, 3_333_333)  # 1/3 gain, 10/3 lift
    assert out[3] == (1, 1, 3, 1_000_000, 3_333_333)
    assert out[10] == (1, 0, 3, 1_000_000, 1_000_000)  # all found, lift 1


def test_chisq_drift_known_exact_value(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.analytics import chisq_drift

    # before: 30 a / 10 b ; after: 10 a / 30 b  (classic 2x2)
    rows = (
        [("a", 0)] * 30 + [("b", 0)] * 10 + [("a", 1)] * 10 + [("b", 1)] * 30
    )
    df = spark.createDataFrame(rows, "cat string, aft int")
    out = {
        r["category"]: (r["n_before"], r["n_after"], r["contrib_milli"])
        for r in chisq_drift(df, "cat", F.col("aft") == 1).collect()
    }
    # D = o_a*nb - o_b*na = 10*40 - 30*40 = -800; D^2 = 640000
    # contrib = 640000 / (40*40*40) = 10.0 exactly -> 10000 milli each
    assert out["a"] == (30, 10, 10_000)
    assert out["b"] == (10, 30, 10_000)
    # total chi2 = 20.0 == the textbook value for this table


def test_rrf_fusion_known_exact_values(spark):
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.ml import rrf_fusion

    # ranker A orders 1,2,3 ; ranker B orders 3,2,1
    rows = [("g", 1, 30, 10), ("g", 2, 20, 20), ("g", 3, 10, 30)]
    df = spark.createDataFrame(rows, "key string, id int, sa int, sb int")
    out = {
        r["id"]: (r["rank_a"], r["rank_b"], r["rrf_micro"])
        for r in rrf_fusion(
            df, "key", "id",
            F.col("sa").cast("bigint"), F.col("sb").cast("bigint"),
        ).collect()
    }
    c1, c2, c3 = 1_000_000 // 61, 1_000_000 // 62, 1_000_000 // 63
    assert out[1] == (1, 3, c1 + c3)
    assert out[2] == (2, 2, c2 + c2)
    assert out[3] == (3, 1, c3 + c1)


def test_ngram_novelty_short_and_duplicate_docs(spark):
    from pdcm_etl_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # 2 shingles, both novel
            (2, "alpha beta gamma epsilon"),   # 1 of 2 novel
            (3, "alpha beta gamma delta"),     # exact dup of 1 -> 0 novel
            (4, "too short"),                  # < 3 words -> NULL ppm
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
        for r in ngram_novelty(docs).collect()
    }
    assert out[1] == (2, 2, 1_000_000)
    assert out[2] == (2, 1, 500_000)
    assert out[3] == (2, 0, 0)
    assert out[4] == (0, 0, None)


def test_weighted_median_known_exact_values(spark):
    from pdcm_etl_spark.operators.ml import weighted_median_group

    # values 1..4 with weights 1,1,1,7 -> total 10, half 5: cumulative
    # hits 5 only at value 4 -> weighted median 4 (unweighted median 2)
    df = spark.createDataFrame(
        [("g", 1, 1, 1), ("g", 2, 2, 1), ("g", 3, 3, 1), ("g", 4, 4, 7)],
        "k string, id int, v int, w int",
    )
    r = weighted_median_group(
        df, "k", "id", F.col("v").cast("bigint"), F.col("w")
    ).collect()[0]
    assert (r["n"], r["total_weight"], r["wmedian_micro"]) == (4, 10, 4)
    # equal weights reduce to the plain lower median
    eq = spark.createDataFrame(
        [("g", i, v, 1) for i, v in enumerate([5, 1, 9, 3])],
        "k string, id int, v int, w int",
    )
    assert (
        weighted_median_group(
            eq, "k", "id", F.col("v").cast("bigint"), F.col("w")
        ).collect()[0]["wmedian_micro"]
        == 3
    )
    # exact half-crossing at a boundary: w=(1,1) values (1,2): cum(1)*2
    # == total -> lower median 1
    half = spark.createDataFrame(
        [("g", 1, 1, 1), ("g", 2, 2, 1)], "k string, id int, v int, w int"
    )
    assert (
        weighted_median_group(
            half, "k", "id", F.col("v").cast("bigint"), F.col("w")
        ).collect()[0]["wmedian_micro"]
        == 1
    )
    # zero/negative weights are dropped, not poison
    wz = spark.createDataFrame(
        [("g", 1, 7, 0), ("g", 2, 3, 5)], "k string, id int, v int, w int"
    )
    r = weighted_median_group(
        wz, "k", "id", F.col("v").cast("bigint"), F.col("w")
    ).collect()[0]
    assert (r["n"], r["wmedian_micro"]) == (1, 3)


def test_concentration_topn_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import concentration_topn

    # 12 members: top-10 hold 100+90+...+10 = 550 of 553 total
    rows = [("g", i, (11 - i) * 10) for i in range(1, 12)] + [("g", 12, 3)]
    df = spark.createDataFrame(rows, "k string, id int, v int")
    r = concentration_topn(
        df, "k", "id", F.col("v").cast("bigint"), top_n=10
    ).collect()[0]
    assert (r["n"], r["topn_value"], r["total_value"]) == (12, 550, 553)
    assert r["topn_share_ppm"] == (550 * 1_000_000) // 553
    # group smaller than N -> share exactly 1e6
    small = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 7)], "k string, id int, v int"
    )
    assert (
        concentration_topn(
            small, "k", "id", F.col("v").cast("bigint"), top_n=10
        ).collect()[0]["topn_share_ppm"]
        == 1_000_000
    )
    # all-zero total -> NULL share, not division blowup
    zero = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 0)], "k string, id int, v int"
    )
    assert (
        concentration_topn(
            zero, "k", "id", F.col("v").cast("bigint"), top_n=10
        ).collect()[0]["topn_share_ppm"]
        is None
    )


def test_seasonal_anomaly_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import seasonal_anomaly

    # three Mondays at 100, one Monday at 260: baseline (lower median of
    # 100,100,100,260) = 100; the spike deviates +160% -> anomaly at the
    # 50% default threshold, the others deviate 0
    rows = [
        ("a", "2024-01-01 10:00:00", 100),  # Mondays: 2024-01-01 + 7k
        ("a", "2024-01-08 10:00:00", 100),
        ("a", "2024-01-15 10:00:00", 100),
        ("a", "2024-01-22 10:00:00", 260),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v int").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        r["day_idx"]: r
        for r in seasonal_anomaly(
            df, "k", "ts", F.col("v").cast("bigint")
        ).collect()
    }
    assert len(out) == 4
    spike = out[max(out)]
    assert spike["baseline_micro"] == 100
    assert spike["dev_ppm"] == 1_600_000
    assert spike["is_anomaly"] is True
    flat = out[min(out)]
    assert flat["dev_ppm"] == 0 and flat["is_anomaly"] is False
    # negative deviation: sign-split truncation (-50% of 100 -> -500000)
    rows2 = [
        ("a", "2024-01-01 10:00:00", 100),
        ("a", "2024-01-08 10:00:00", 100),
        ("a", "2024-01-15 10:00:00", 50),
    ]
    df2 = spark.createDataFrame(rows2, "k string, ts string, v int").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out2 = {
        r["day_idx"]: r
        for r in seasonal_anomaly(
            df2, "k", "ts", F.col("v").cast("bigint")
        ).collect()
    }
    assert out2[max(out2)]["dev_ppm"] == -500_000


def test_user_accumulation_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import user_accumulation

    rows = [
        ("a", 1, "2024-01-01 09:00:00"),
        ("a", 1, "2024-01-02 09:00:00"),  # repeat visit, not a new user
        ("a", 2, "2024-01-02 09:00:00"),
        ("a", 3, "2024-01-02 10:00:00"),
        ("a", 4, "2024-01-05 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, u int, ts string").select(
        "k", "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = sorted(
        user_accumulation(df, "k", "u", "ts").collect(),
        key=lambda r: r["day_idx"],
    )
    assert [(r["new_users"], r["cum_users"]) for r in out] == [
        (1, 1),
        (2, 3),
        (1, 4),
    ]


def test_split_leakage_audit_known_exact_values(spark):
    from pdcm_etl_spark.operators.sampling import split_leakage_audit

    # cluster ids chosen so their portable_hash60 folds (md5-hex
    # first-15 % 4 over the id string) are all four DISTINCT folds:
    # 0→2, 1→0, 3→3, 4→1 — the leak must be detected, so every
    # assertion below runs unconditionally (no 'if out:' guard).
    # Token order and repetition must not matter: the fingerprint is
    # md5 of the sorted distinct token SET.
    rows = [
        (0, "alpha beta gamma"),
        (1, "gamma beta alpha"),
        (3, "beta beta alpha gamma"),
        (4, "alpha beta gamma"),
    ] + [(i, f"unique text {i}") for i in (5, 6, 7, 8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_audit(df, id_col="doc_id", n_folds=4).collect()
    assert len(out) == 1  # unique docs can never leak; the cluster must
    r = out[0]
    assert r["n_docs"] == 4
    assert r["min_id"] == 0 and r["max_id"] == 4
    assert r["n_folds_hit"] == 4
    assert r["folds"] == "0,1,2,3"
    # single-fold split can never report leaks — since r10 that is a
    # raised precondition (a vacuous audit is a caller bug), not an
    # empty result
    with pytest.raises(ValueError, match="at least 2 folds"):
        split_leakage_audit(df, id_col="doc_id", n_folds=1)


def test_mode_group_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import mode_group

    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "c"), ("h", None),
         ("h", "z")],
        "k string, v string",
    )
    out = {r["key"]: r for r in mode_group(df, "k", "v").collect()}
    assert (out["g"]["mode_value"], out["g"]["mode_n"],
            out["g"]["n_distinct_values"]) == ("b", 2, 3)
    # NULLs excluded; a group of only one non-null value still modes
    assert (out["h"]["mode_value"], out["h"]["mode_n"]) == ("z", 1)
    # deterministic tie-break: equal counts -> smallest value
    tie = spark.createDataFrame(
        [("g", "y"), ("g", "x")], "k string, v string"
    )
    assert mode_group(tie, "k", "v").collect()[0]["mode_value"] == "x"


def test_fk_orphan_audit_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import fk_orphan_audit

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, fk int"
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    r = fk_orphan_audit(fact, [("fk", dim, "pk")], "fact").collect()[0]
    assert (r["n_rows"], r["n_null_fk"], r["n_orphan"]) == (4, 1, 1)
    # clean edge reports zero orphans
    clean = spark.createDataFrame([(1, 10), (2, 20)], "id int, fk int")
    r2 = fk_orphan_audit(clean, [("fk", dim, "pk")], "fact").collect()[0]
    assert (r2["n_null_fk"], r2["n_orphan"]) == (0, 0)


def test_source_token_overlap_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import source_token_overlap

    # A vocab {a,b,c}, B vocab {b,c,d}, C vocab {x}
    df = spark.createDataFrame(
        [("A", "a b c"), ("A", "b"), ("B", "b c d"), ("C", "x")],
        "source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_token_overlap(df).collect()
    }
    # only the overlapping pair is reported
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r["vocab_a"], r["vocab_b"], r["n_shared"]) == (3, 3, 2)
    assert r["jaccard_ppm"] == (2 * 1_000_000) // 4


def test_vocab_accumulation_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import vocab_accumulation

    # ids 0..9 with 10 buckets -> bucket == id; tokens: doc0 {a,b},
    # doc1 {b,c}, doc5 {a,d}, others empty-ish unique
    rows = [(0, "a b"), (1, "b c"), (5, "a d"), (9, "e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in vocab_accumulation(df).collect()}
    assert (out[0]["n_new_tokens"], out[0]["cum_vocab"]) == (2, 2)  # a,b
    assert (out[1]["n_new_tokens"], out[1]["cum_vocab"]) == (1, 3)  # c
    assert (out[5]["n_new_tokens"], out[5]["cum_vocab"]) == (1, 4)  # d
    assert (out[9]["n_new_tokens"], out[9]["cum_vocab"]) == (1, 5)  # e
    assert 2 not in out  # no first-seen tokens there


def test_churn_summary_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import churn_summary

    # horizon = max last_day; user u1 active at horizon, u2 last seen
    # 10 days before (churned at the 7-day policy), u3 8 days cohort
    # later but quiet 8 days (churned)
    rows = [
        (1, "2024-02-01 10:00:00"),
        (1, "2024-02-20 10:00:00"),
        (2, "2024-02-10 10:00:00"),
        (3, "2024-02-09 10:00:00"),
        (3, "2024-02-12 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "u int, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = churn_summary(df, "u", "ts").collect()
    total = {(r["churned"]): 0 for r in out}
    for r in out:
        total[r["churned"]] += r["n_users"]
    assert total == {False: 1, True: 2}
    # per-cohort split: u1 and u3's weeks differ from u2's only if the
    # epoch-week boundary separates them — verify count conservation
    assert sum(r["n_users"] for r in out) == 3


def test_mode_and_golden_record_merge_known_exact_values(spark):
    from pdcm_etl_spark.operators.dedup import golden_record_merge

    # one cluster of three docs (same token set, different order/length)
    # and one singleton; lang mode 'en' (2 vs 1), longest text doc 2
    # NOTE single spaces only: the canonical fingerprint keeps the ''
    # token a double space would create, which splits the cluster
    rows = [
        (1, "alpha beta", "en"),
        (2, "beta alpha beta alpha", "en"),   # longest (21 chars)
        (3, "beta alpha", "de"),
        (9, "solo text", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["n_docs"]: r for r in golden_record_merge(df).collect()}
    c = out[3]
    assert c["golden_id"] == 1
    assert c["best_text_id"] == 2
    assert c["best_text_len"] == len("beta alpha beta alpha")
    assert c["attr_mode"] == "en"
    assert c["total_chars"] == sum(len(t) for _, t, _ in
                                   [rows[0], rows[1], rows[2]])
    s = out[1]
    assert (s["golden_id"], s["attr_mode"]) == (9, "fr")
    # mode tie (1x de, 1x en in a 2-cluster) -> smallest value wins
    tie = spark.createDataFrame(
        [(1, "x y", "de"), (2, "y x", "en")],
        "doc_id long, text string, lang string",
    )
    assert golden_record_merge(tie).collect()[0]["attr_mode"] == "de"


def test_balanced_downsample_known_exact_values(spark):
    from pdcm_etl_spark.operators.sampling import balanced_downsample

    rows = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = balanced_downsample(df, "lang", "doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r["class"], []).append(r["key"])
    # every class downsampled to the min class size (3)
    assert {k: len(v) for k, v in per.items()} == {"a": 3, "b": 3}
    # determinism: same input -> same keys
    out2 = balanced_downsample(df, "lang", "doc_id").collect()
    assert sorted((r["class"], r["key"]) for r in out) == sorted(
        (r["class"], r["key"]) for r in out2
    )
    # the kept set is hash-ranked, not "first ids"
    assert set(per["b"]) == {100, 101, 102}


def test_decile_migration_known_exact_values(spark):
    from pdcm_etl_spark.operators.ml import decile_migration

    # 10 users, period A values ascending 1..10, period B reversed —
    # with n_bins=10 and n=10, decile_a = rank, decile_b = 11 - rank
    rows = []
    for u in range(1, 11):
        rows.append(("g", u, u, 0))           # period A value u
        rows.append(("g", u, 11 - u, 1))      # period B value 11-u
    df = spark.createDataFrame(rows, "k string, u int, v int, b int")
    out = decile_migration(
        df,
        key_col="k",
        id_col="u",
        value_micro=F.col("v").cast("bigint"),
        period_b_pred=F.col("b") == 1,
    ).collect()
    cells = {(r["decile_a"], r["decile_b"]): r["n_entities"] for r in out}
    assert all(v == 1 for v in cells.values()) and len(cells) == 10
    assert all(a + b == 11 for a, b in cells)
    # a user active in only one period is excluded
    one = spark.createDataFrame(
        [("g", 1, 5, 0), ("g", 2, 5, 0), ("g", 2, 7, 1)],
        "k string, u int, v int, b int",
    )
    out1 = decile_migration(
        one, "k", "u", F.col("v").cast("bigint"), F.col("b") == 1
    ).collect()
    assert sum(r["n_entities"] for r in out1) == 1


# ---------------------------------------------------------------------------
# round-9 operators: exact-value tests


def test_label_noise_audit_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import label_noise_audit

    rows = [
        # one content cluster (same token SET, order/dup-insensitive)
        # labeled en twice, de once
        (0, "alpha beta gamma", "en"),
        (1, "gamma beta alpha", "en"),
        (2, "beta beta alpha gamma", "de"),
        # clean cluster: same content, same label twice -> no conflict
        (3, "delta epsilon", "fr"),
        (4, "epsilon delta", "fr"),
        # unique doc
        (5, "zeta eta theta", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = label_noise_audit(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3
    assert r["n_labels"] == 2
    assert r["labels"] == "de,en"
    assert r["majority_label"] == "en" and r["majority_n"] == 2
    # majority tie breaks to the smallest label
    tie = spark.createDataFrame(
        [(0, "x y", "b"), (1, "y x", "a")],
        "doc_id long, text string, lang string",
    )
    t = label_noise_audit(tie).collect()[0]
    assert t["majority_label"] == "a" and t["majority_n"] == 1


def test_dup_rate_by_source_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import dup_rate_by_source

    rows = [
        # srcA: 4 docs, 2 distinct contents -> dup_rate 50%; one of the
        # clusters also appears in srcB -> cross-source counts 2 docs
        (0, "aa bb", "srcA"),
        (1, "bb aa", "srcA"),
        (2, "cc dd", "srcA"),
        (3, "dd cc", "srcA"),
        (4, "aa bb", "srcB"),
        (5, "unique here", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in dup_rate_by_source(df).collect()}
    a = out["srcA"]
    assert (a["n_docs"], a["n_distinct"]) == (4, 2)
    assert a["dup_rate_ppm"] == 500_000
    assert a["cross_source_ppm"] == 500_000  # the 'aa bb' cluster's 2 docs
    b = out["srcB"]
    assert (b["n_docs"], b["n_distinct"]) == (2, 2)
    assert b["dup_rate_ppm"] == 0
    assert b["cross_source_ppm"] == 500_000


def test_token_frequency_spectrum_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import token_frequency_spectrum

    # token freqs: 'a' x4 (bucket 2), 'b' x2, 'c' x2 (bucket 1), 'd' x1
    # (bucket 0); total occurrences 9
    rows = [(0, "a a b"), (1, "a b c"), (2, "a c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["freq_bucket"]: r for r in token_frequency_spectrum(df).collect()}
    assert (out[2]["n_tokens"], out[2]["n_occurrences"]) == (1, 4)
    assert (out[1]["n_tokens"], out[1]["n_occurrences"]) == (2, 4)
    assert (out[0]["n_tokens"], out[0]["n_occurrences"]) == (1, 1)
    # cumulative share from the COMMON end: bucket2=4/9, +bucket1=8/9, all=9/9
    assert out[2]["cum_share_ppm"] == 4 * 1_000_000 // 9
    assert out[1]["cum_share_ppm"] == 8 * 1_000_000 // 9
    assert out[0]["cum_share_ppm"] == 1_000_000


def test_char_class_profile_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import char_class_profile

    # 'ab 12!' = 6 chars: 2 alpha, 2 digit, 1 space, 1 other
    df = spark.createDataFrame(
        [(0, "ab 12!", "s1")], "doc_id long, text string, source string"
    )
    r = char_class_profile(df).collect()[0]
    assert r["n_chars"] == 6
    assert r["alpha_ppm"] == 2 * 1_000_000 // 6
    assert r["digit_ppm"] == 2 * 1_000_000 // 6
    assert r["space_ppm"] == 1 * 1_000_000 // 6
    # other is the exact residual of the three floors — shares always
    # total exactly 1e6
    assert r["other_ppm"] == (
        1_000_000 - r["alpha_ppm"] - r["digit_ppm"] - r["space_ppm"]
    )


def test_rare_category_collapse_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import rare_category_collapse

    rows = [("big",)] * 5 + [("mid",)] * 3 + [("tiny1",)] * 2 + [("tiny2",)]
    df = spark.createDataFrame(rows, "cat string")
    out = {r["category"]: r for r in
           rare_category_collapse(df, "cat", min_n=3).collect()}
    assert (out["big"]["n_rows"], out["big"]["n_source_categories"]) == (5, 1)
    assert (out["mid"]["n_rows"], out["mid"]["n_source_categories"]) == (3, 1)
    assert (out["__other__"]["n_rows"],
            out["__other__"]["n_source_categories"]) == (3, 2)
    # totals conserved
    assert sum(r["n_rows"] for r in out.values()) == 11


def test_interarrival_profile_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import interarrival_profile

    # gaps for key 'k': 10, 20, 100, 30 -> sorted 10,20,30,100
    # n=4: lower median idx (4+1)//2=2 -> 20; p90 idx (36+9)//10=4 -> 100
    rows = [
        ("k", 1, "2024-01-01 00:00:00"),
        ("k", 2, "2024-01-01 00:00:10"),
        ("k", 3, "2024-01-01 00:00:30"),
        ("k", 4, "2024-01-01 00:02:10"),
        ("k", 5, "2024-01-01 00:02:40"),
        ("solo", 6, "2024-01-01 00:00:00"),  # no gap -> no output row
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts string"
    ).select("event_type", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["key"]: r for r in interarrival_profile(
        df, "event_type", "ts", "event_id").collect()}
    assert set(out) == {"k"}
    r = out["k"]
    assert r["n_gaps"] == 4
    assert (r["min_gap_sec"], r["max_gap_sec"]) == (10, 100)
    assert r["median_gap_sec"] == 20
    assert r["p90_gap_sec"] == 100


def test_stratified_kfold_assign_balance_property(spark):
    from pdcm_etl_spark.operators.sampling import stratified_kfold_assign

    rows = [(i, "a" if i < 10 else "b") for i in range(17)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = stratified_kfold_assign(df, "id", "cls", n_folds=4).collect()
    by_class: dict = {}
    for r in out:
        by_class.setdefault(r["class"], {})[r["fold"]] = r["n_rows"]
    # round-robin by rank: per class, fold sizes differ by at most 1 and
    # every fold is hit (classes bigger than n_folds)
    for cls, folds in by_class.items():
        sizes = [folds.get(f, 0) for f in range(4)]
        assert max(sizes) - min(sizes) <= 1, (cls, sizes)
    assert sum(r["n_rows"] for r in out) == 17
    # determinism: same input -> identical assignment
    again = stratified_kfold_assign(df, "id", "cls", n_folds=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_degree_histogram_known_exact_values(spark):
    from pdcm_etl_spark.operators.graph import degree_histogram

    # node degrees (distinct neighbors): n1 -> 1 (bucket 0, parallel edge
    # collapses), n2 -> 2 (bucket 1), n3 -> 4 (bucket 2), n4 null-skipped
    rows = (
        [("n1", "x"), ("n1", "x")]
        + [("n2", "x"), ("n2", "y")]
        + [("n3", a) for a in "wxyz"]
        + [(None, "x"), ("n4", None)]
    )
    df = spark.createDataFrame(rows, "s string, d string")
    out = {r["degree_bucket"]: r for r in
           degree_histogram(df, "s", "d").collect()}
    assert (out[0]["n_nodes"], out[0]["n_edges"]) == (1, 1)
    assert (out[1]["n_nodes"], out[1]["n_edges"]) == (1, 2)
    assert (out[2]["n_nodes"], out[2]["n_edges"]) == (1, 4)


def test_embedding_norm_profile_known_exact_values(spark):
    from pdcm_etl_spark.operators.ml import embedding_norm_profile

    rows = [
        (0, [3.0, 4.0], 1),      # norm 5.0 -> 5_000_000 ppm
        (1, [0.0, 0.0], 1),      # zero vector
        (2, [1.0, 0.0, 0.0], 2),  # norm 1.0, dim 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in
           embedding_norm_profile(df, "label").collect()}
    a = out[1]
    assert (a["n_vecs"], a["n_zero"], a["n_dims"]) == (2, 1, 2)
    assert (a["min_norm_ppm"], a["max_norm_ppm"]) == (0, 5_000_000)
    assert a["avg_norm_ppm"] == 2_500_000
    b = out[2]
    assert (b["n_vecs"], b["n_zero"], b["n_dims"]) == (1, 0, 3)
    assert b["min_norm_ppm"] == 1_000_000


def test_pit_enrich_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import pit_enrich

    facts = spark.createDataFrame(
        [
            (100, "u1", "2024-01-01 10:00:00"),  # before any change -> NULL
            (101, "u1", "2024-01-02 10:00:00"),  # after change 1 -> 7
            (102, "u1", "2024-01-03 10:00:00"),  # after change 2 -> 9
            (103, "u1", "2024-01-02 09:00:00"),  # same instant as change 1
            (104, "u2", "2024-01-05 00:00:00"),  # other key, no changes
        ],
        "fid long, k string, ts string",
    ).select("fid", "k", F.col("ts").cast("timestamp").alias("ts"))
    changes = spark.createDataFrame(
        [
            ("u1", "2024-01-02 09:00:00", 1, 7),
            ("u1", "2024-01-03 09:00:00", 2, 9),
            # two changes at the SAME instant: highest change id wins
            ("u1", "2024-01-03 09:00:00", 3, 11),
        ],
        "k string, ts string, cid long, tier long",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "cid", "tier")
    out = {r["fid"]: r["attr_at_ts"] for r in pit_enrich(
        facts, changes, key_col="k", ts_col="ts",
        attr_col="tier", change_id_col="cid").collect()}
    assert out[100] is None          # fact before the dimension existed
    assert out[101] == 7
    assert out[102] == 11            # same-instant changes: max cid wins
    assert out[103] == 7             # same-instant change IS visible
    assert out[104] is None
    # row preservation: every fact comes back exactly once
    assert len(out) == 5


def test_rfm_segments_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import rfm_segments

    # one group, 5 customers with strictly increasing recency/frequency/
    # monetary in the SAME customer order -> customer i lands in bin i+1
    # on all three dimensions
    rows = []
    for i in range(5):
        for j in range(i + 1):  # frequency = i+1 orders
            rows.append(
                ("g", i, f"2024-01-{i + 1:02d} 00:00:00", 100.0 * (i + 1))
            )
    df = spark.createDataFrame(
        rows, "grp string, cust long, ts string, amt double"
    ).select("grp", "cust", F.col("ts").cast("timestamp").alias("ts"), "amt")
    out = rfm_segments(
        df, group_col="grp", customer_col="cust", ts_col="ts",
        amount_micro=F.expr("CAST(amt * 1000000 AS DECIMAL(38,0))"),
    ).collect()
    segs = {(r["r_bin"], r["f_bin"], r["m_bin"]): r["n_customers"]
            for r in out}
    assert segs == {(i, i, i): 1 for i in range(1, 6)}


def test_label_distinctive_terms_known_exact_values(spark):
    from pdcm_etl_spark.operators.text import label_distinctive_terms

    # 'zz' appears only under label a (6 of a's 12 tokens); 'cc' is the
    # common filler everywhere
    rows = [
        (0, "zz zz zz cc cc cc", "a"),
        (1, "zz zz zz cc cc cc", "a"),
        (2, "cc cc cc cc cc cc", "b"),
        (3, "cc cc cc cc cc cc", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = label_distinctive_terms(df, k=2, min_count=5).collect()
    by = {(r["label"], r["term"]): r for r in out}
    # zz: share in a = 6/12, global = 6/24 -> lift 2.0
    assert by[("a", "zz")]["lift_ppm"] == 2_000_000
    assert by[("a", "zz")]["n_in_label"] == 6
    assert by[("a", "zz")]["rank"] == 1
    # cc under b: share 12/12 vs global 18/24 -> lift 4/3
    assert by[("b", "cc")]["lift_ppm"] == 1_333_333
    # min_count prunes: no (b, zz) row at all
    assert ("b", "zz") not in by


def test_freshness_audit_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import freshness_audit

    rows = [
        ("a", "2024-01-10 00:00:00"),  # frontier
        ("a", "2024-01-09 12:00:00"),  # within 1d
        ("a", "2024-01-01 00:00:00"),  # outside 7d
        ("b", "2024-01-05 00:00:00"),  # 5d stale, within 7d window
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["key"]: r for r in freshness_audit(df, "k", "ts").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_rows"], a["lag_sec"]) == (3, 0)
    assert (a["n_recent"], a["n_window"]) == (2, 2)
    assert b["lag_sec"] == 5 * 86_400
    assert (b["n_recent"], b["n_window"]) == (0, 1)


def test_audience_overlap_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import audience_overlap

    rows = [
        (1, "view"), (1, "click"), (1, "view"),   # dup collapses
        (2, "view"),
        (3, "click"), (3, "purchase"),
        (None, "view"), (4, None),                 # nulls dropped
    ]
    df = spark.createDataFrame(rows, "u long, g string")
    out = {(r["group_a"], r["group_b"]): r["n_entities"]
           for r in audience_overlap(df, "u", "g").collect()}
    assert out[("view", "view")] == 2          # diagonal = audience size
    assert out[("click", "click")] == 2
    assert out[("click", "view")] == 1         # user 1 only
    assert out[("click", "purchase")] == 1     # user 3
    assert ("purchase", "view") not in out     # no co-membership
    # symmetric pairs emitted once, sorted a <= b
    assert all(a <= b for a, b in out)


def test_revenue_retention_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import revenue_retention

    # one cohort: week0 revenue 100, week1 revenue 110 -> NDR 110%
    rows = [
        (1, "2024-01-04 00:00:00", 60.0),
        (2, "2024-01-05 00:00:00", 40.0),
        (1, "2024-01-11 00:00:00", 110.0),
    ]
    df = spark.createDataFrame(rows, "u long, ts string, v double").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {r["week_offset"]: r for r in revenue_retention(
        df, "u", "ts",
        F.expr("CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))"),
    ).collect()}
    assert out[0]["revenue_micro"] == 100_000_000
    assert out[0]["retention_ppm"] == 1_000_000
    assert out[1]["revenue_micro"] == 110_000_000
    assert out[1]["retention_ppm"] == 1_100_000


def test_activity_streaks_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import activity_streaks

    # user 1: days 1,2,3 then 7,8 -> longest 3, current 2 (ends last)
    # user 2: one day -> 1/1/1
    rows = (
        [(1, f"2024-01-0{d} 09:00:00") for d in (1, 2, 3, 7, 8)]
        + [(1, "2024-01-02 18:00:00")]  # same-day repeat collapses
        + [(2, "2024-01-05 00:00:00")]
    )
    df = spark.createDataFrame(rows, "u long, ts string").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["user"]: r for r in activity_streaks(df, "u", "ts").collect()}
    u1 = out[1]
    assert (u1["n_active_days"], u1["n_streaks"]) == (5, 2)
    assert (u1["longest_streak"], u1["current_streak"]) == (3, 2)
    u2 = out[2]
    assert (u2["longest_streak"], u2["current_streak"]) == (1, 1)


def test_json_key_profile_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import json_key_profile

    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2}',), ('{"b": "x"}',),
         (None,)],
        "props string",
    )
    out = {r["key"]: r for r in json_key_profile(df, "props").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_rows"], a["n_distinct_values"]) == (2, 2)
    assert (a["min_value"], a["max_value"]) == ("1", "2")
    assert (b["n_rows"], b["n_distinct_values"]) == (2, 1)
    assert b["min_value"] == "x"


def test_nzv_audit_known_exact_values(spark):
    from pdcm_etl_spark.operators.analytics import nzv_audit

    df = spark.createDataFrame(
        [("c", 1)] * 9 + [("d", 2)],
        "flag string, num int",
    )
    out = {r["col_name"]: r for r in nzv_audit(df, ["flag", "num"]).collect()}
    f = out["flag"]
    assert (f["n_rows"], f["n_distinct"]) == (10, 2)
    assert (f["mode_value"], f["mode_share_ppm"]) == ("c", 900_000)
    n = out["num"]
    assert (n["mode_value"], n["mode_share_ppm"]) == ("1", 900_000)


def test_out_of_orderness_profile_known_exact_values(spark):
    from pdcm_etl_spark.operators.temporal import out_of_orderness_profile

    # arrival order (id): event times 100, 400, 250, 390, 1200, 200
    # running max:        100, 400, 400, 400, 1200, 1200
    # lag:                  0,   0, 150,  10,    0, 1000
    rows = [
        ("k", 1, 100), ("k", 2, 400), ("k", 3, 250),
        ("k", 4, 390), ("k", 5, 1200), ("k", 6, 200),
    ]
    df = spark.createDataFrame(rows, "t string, id long, sec long").select(
        "t", "id",
        F.expr("CAST(timestamp_seconds(sec) AS TIMESTAMP)").alias("ts"),
    )
    out = out_of_orderness_profile(
        df, key_col="t", ts_col="ts", arrival_col="id",
        late_secs=(60, 600),
    ).collect()
    r = out[0]
    assert r["n_events"] == 6
    assert r["max_disorder_sec"] == 1000
    assert r["n_late_a"] == 2   # lags 150 and 1000 exceed 60
    assert r["n_late_b"] == 1   # only 1000 exceeds 600


def test_snapshot_field_churn_known_exact_values(spark):
    from pdcm_etl_spark.operators.cdc import snapshot_field_churn

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (9, "gone", "z")],
        "k long, f1 string, f2 string",
    )
    new = spark.createDataFrame(
        [(1, "a", "now"),   # f2 NULL -> value: counts as change
         (2, "B", "x"),     # f1 changed
         (3, "c", None),    # f2 value -> NULL: counts as change
         (4, "new", "w")],  # added key: not persisting, ignored
        "k long, f1 string, f2 string",
    )
    out = {r["col_name"]: r for r in snapshot_field_churn(
        old, new, "k", ["f1", "f2"]).collect()}
    assert out["f1"]["n_persisting"] == 3
    assert out["f1"]["n_changed"] == 1
    assert out["f2"]["n_changed"] == 2  # NULL-safe both directions
    assert out["f2"]["churn_ppm"] == 2 * 1_000_000 // 3


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=1, max_size=30,
        ).map(" ".join),
        min_size=1, max_size=8,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_substring_dedup_properties(spark, texts, parts):
    """Lee-et-al substring dedup invariants against a pure-Python
    suffix-scan replica: sliding k-windows, first occurrence by
    (id, pos) — including SELF-repetition — and overlap-merged maximal
    spans; plus partition independence."""
    from pdcm_etl_spark.operators.dedup import substring_dedup

    k = 4
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"],
         r["span_tokens"], r["n_windows"])
        for r in substring_dedup(df, k=k).collect()
    )
    rep = sorted(
        (r["doc_id"], r["span_start"], r["span_end"],
         r["span_tokens"], r["n_windows"])
        for r in substring_dedup(df.repartition(parts), k=k).collect()
    )
    assert got == rep
    # python replica: first-occurrence over (id, pos), then merge
    # windows into islands (new island iff gap >= k)
    seen: set[str] = set()
    dup_pos: dict[int, list[int]] = {}
    for i, t in sorted(rows):
        ws = t.lower().split(" ")
        for p in range(len(ws) - k + 1):
            win = " ".join(ws[p : p + k])
            if win in seen:
                dup_pos.setdefault(i, []).append(p)
            else:
                seen.add(win)
    expect = []
    for i, ps in dup_pos.items():
        start, prev, n = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev < k:
                prev, n = p, n + 1
            else:
                expect.append((i, start, prev + k - 1,
                               prev + k - start, n))
                start, prev, n = p, p, 1
        expect.append((i, start, prev + k - 1, prev + k - start, n))
    assert got == sorted(expect)


def test_substring_dedup_exact_copy_and_selfrep(spark):
    """Deterministic cases: an exact copy of an earlier doc is one
    maximal span covering the whole copy; in-document repetition
    (the same k tokens twice in ONE doc) is dup material at its second
    occurrence even with no cross-doc match."""
    from pdcm_etl_spark.operators.dedup import substring_dedup

    base = " ".join(f"w{i}" for i in range(10))          # 10 tokens
    selfrep = "x1 x2 x3 x4 zz1 zz2 zz3 x1 x2 x3 x4"      # k=4 repeat at 7
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, selfrep)],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"],
         r["span_tokens"], r["n_windows"])
        for r in substring_dedup(df, k=4).collect()
    )
    assert got == [
        (1, 0, 9, 10, 7),   # whole copy: windows 0..6 merge to one span
        (2, 7, 10, 4, 1),   # self-repetition: second x1..x4 occurrence
    ]


def test_audience_overlap_unbounded_group_raises(spark):
    """The bounded-vocabulary contract is enforced in-plan: an entity
    with more distinct groups than max_groups aborts the job instead of
    going quadratic (round-9 verdict ask 4)."""
    from pdcm_etl_spark.operators.analytics import audience_overlap

    rows = [(1, f"g{i}") for i in range(5)] + [(2, "g0"), (2, "g1")]
    df = spark.createDataFrame(rows, "e bigint, g string")
    # happy path under the cap
    ok = audience_overlap(df, "e", "g", max_groups=5).collect()
    # entity-1 contributes all 15 (i<=j) cells over 5 groups; entity-2's
    # three cells merge into existing ones
    assert len(ok) == 5 * 6 // 2
    with pytest.raises(Exception, match="not a bounded vocabulary"):
        audience_overlap(df, "e", "g", max_groups=4).collect()


def test_split_leakage_bad_folds_raises(spark):
    from pdcm_etl_spark.operators.sampling import split_leakage_audit

    df = spark.createDataFrame([(1, "t")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="at least 2 folds"):
        split_leakage_audit(df, "doc_id", n_folds=1)


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=1, max_size=30,
        ).map(" ".join),
        min_size=1, max_size=8,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_substring_scrub_properties(spark, texts, parts):
    """The cleaned corpus against a pure-Python replica: every token
    covered by a non-first duplicated span is cut, survivors keep
    their order, kept_tokens ≡ n_tokens − dup_tokens (spans are
    disjoint); plus partition independence."""
    from pdcm_etl_spark.operators.dedup import substring_scrub

    k = 4
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_tokens"],
         r["kept_tokens"], r["kept_text"])
        for r in substring_scrub(df, k=k).collect()
    )
    rep = sorted(
        (r["doc_id"], r["n_tokens"], r["dup_tokens"],
         r["kept_tokens"], r["kept_text"])
        for r in substring_scrub(df.repartition(parts), k=k).collect()
    )
    assert got == rep
    # python replica: mark duplicated window positions (first
    # occurrence global over (id, pos)), expand to covered token
    # positions, cut, reassemble
    seen: set[str] = set()
    cover: dict[int, set[int]] = {i: set() for i, _ in rows}
    for i, t in sorted(rows):
        ws = t.lower().split(" ")
        for p in range(len(ws) - k + 1):
            win = " ".join(ws[p : p + k])
            if win in seen:
                cover[i].update(range(p, p + k))
            else:
                seen.add(win)
    expect = []
    for i, t in rows:
        ws = t.lower().split(" ")
        kept = [w for p, w in enumerate(ws) if p not in cover[i]]
        expect.append(
            (i, len(ws), len(cover[i]), len(kept), " ".join(kept))
        )
    assert got == sorted(expect)
    for _i, n, dup, kept_n, _txt in got:
        assert kept_n == n - dup


def test_recall_banded_partitions_truth(spark):
    """The banded rows partition the unbanded truth set: band counts
    sum to banding_recall's n_true_pairs, per-band hits never exceed
    the band's truth count, and the J=1.0 band catches the planted
    exact replicas."""
    from pdcm_etl_spark.operators.dedup import (
        banding_recall,
        banding_recall_banded,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38)) + " alt1 alt2"
    # constructed mid-J pair (the synthetic corpus has NO truth pairs
    # below J=0.8 — sf1_verify_r11.jsonl note — so the low bands are
    # exercised here): 20 shared + 20 distinct tokens each side →
    # 18 shared 3-shingles of 38/38 → J = 18/58 ≈ 0.310 → band 300000
    mid_a = " ".join(f"mid{i}" for i in range(20)) + " " + " ".join(
        f"ma{i}" for i in range(20)
    )
    mid_b = " ".join(f"mid{i}" for i in range(20)) + " " + " ".join(
        f"mb{i}" for i in range(20)
    )
    rows = [(0, base), (1, base), (2, near), (20, mid_a), (21, mid_b)] + [
        (10 + i, f"uniq{i} " + " ".join(f"u{i}_{j}" for j in range(20)))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    scalar = banding_recall(df, min_ppm=200_000).collect()[0]
    bands = banding_recall_banded(df, min_ppm=200_000).collect()
    assert sum(b["n_true_pairs"] for b in bands) == scalar["n_true_pairs"]
    assert sum(b["n_hit"] for b in bands) <= scalar["n_lsh_pairs"]
    for b in bands:
        assert 0 <= b["n_hit"] <= b["n_true_pairs"]
        if b["recall_ppm"] is not None:
            assert 0 <= b["recall_ppm"] <= 1_000_000
    exact = [b for b in bands if b["band_lo_ppm"] == 1_000_000]
    assert exact and exact[0]["n_true_pairs"] >= 1
    assert exact[0]["recall_ppm"] == 1_000_000
    # the constructed J≈0.31 pair lands in — and only in — the
    # [0.3, 0.5) band, so stratification separates it from the
    # replica/near bands instead of drowning it in the scalar
    mid = [b for b in bands if b["band_lo_ppm"] == 300_000]
    assert mid and mid[0]["n_true_pairs"] == 1, bands


@SLOW
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=1, max_size=30,
        ).map(" ".join),
        min_size=2, max_size=8,
    ),
    boundary=st.integers(min_value=0, max_value=4),
    parts=st.integers(min_value=1, max_value=5),
)
def test_substring_dedup_incremental_properties(
    spark, texts, boundary, parts
):
    """Incremental substring dedup against a pure-Python replica:
    corpus windows (doc_id < boundary) always keep; batch windows dup
    on (corpus ∪ earlier-batch) occurrence, kr flags the corpus case;
    spans only for batch docs; partition independence; and with an
    all-false is_existing it degenerates to substring_dedup exactly."""
    from pyspark.sql import functions as F

    from pdcm_etl_spark.operators.dedup import (
        substring_dedup,
        substring_dedup_incremental,
    )

    k = 4
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cond = F.col("doc_id") < boundary
    cols = ("doc_id", "span_start", "span_end", "span_tokens",
            "n_windows", "n_corpus_windows")
    got = sorted(
        tuple(r[c] for c in cols)
        for r in substring_dedup_incremental(df, cond, k=k).collect()
    )
    rep = sorted(
        tuple(r[c] for c in cols)
        for r in substring_dedup_incremental(
            df.repartition(parts), cond, k=k
        ).collect()
    )
    assert got == rep
    # python replica
    corpus: set[str] = set()
    for i, t in sorted(rows):
        if i >= boundary:
            continue
        ws = t.lower().split(" ")
        for p in range(len(ws) - k + 1):
            corpus.add(" ".join(ws[p : p + k]))
    seen_new: set[str] = set()
    dup_pos: dict[int, list[tuple[int, int]]] = {}
    for i, t in sorted(rows):
        if i < boundary:
            continue
        ws = t.lower().split(" ")
        for p in range(len(ws) - k + 1):
            win = " ".join(ws[p : p + k])
            if win in corpus:
                dup_pos.setdefault(i, []).append((p, 1))
            elif win in seen_new:
                dup_pos.setdefault(i, []).append((p, 0))
            else:
                seen_new.add(win)
    expect = []
    for i, ps in dup_pos.items():
        start, prev = ps[0][0], ps[0][0]
        n, nc = 1, ps[0][1]
        for p, c in ps[1:]:
            if p - prev < k:
                prev, n, nc = p, n + 1, nc + c
            else:
                expect.append((i, start, prev + k - 1,
                               prev + k - start, n, nc))
                start, prev, n, nc = p, p, 1, c
        expect.append((i, start, prev + k - 1, prev + k - start, n, nc))
    assert got == sorted(expect)
    # degenerate case: empty corpus == plain substring_dedup
    got0 = sorted(
        tuple(r[c] for c in cols)
        for r in substring_dedup_incremental(
            df, F.lit(False), k=k
        ).collect()
    )
    plain = sorted(
        (r["doc_id"], r["span_start"], r["span_end"],
         r["span_tokens"], r["n_windows"], 0)
        for r in substring_dedup(df, k=k).collect()
    )
    assert got0 == plain
