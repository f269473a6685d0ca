"""Property-based Spark↔DuckDB scalar parity (SURVEY §5.2-3): generate
values with hypothesis, run the same scalar expressions through both
engines, demand exact canonical equality. Catches dialect gaps (round
modes, dow numbering, modulo signs, unicode case rules) far cheaper
than t2 round-trips."""

import datetime

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.helpers import canon_value

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _compare(spark, rows, schema, spark_cols, duck_sql):
    """rows → both engines → canonical equality, keyed by row id."""
    sdf = spark.createDataFrame(rows, schema)
    got = [
        tuple(canon_value(v) for v in r)
        for r in sorted(sdf.select("i", *spark_cols).collect())
    ]
    con = duckdb.connect()
    con.register("t", sdf.toPandas())
    want = [
        tuple(canon_value(v) for v in r)
        for r in sorted(con.sql(duck_sql).fetchall())
    ]
    con.close()
    assert got == want


@given(
    st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_float_scalar_parity(spark, xs):
    rows = [(i, x) for i, x in enumerate(xs)]
    _compare(
        spark,
        rows,
        "i int, x double",
        [
            F.floor("x").cast("bigint").alias("fl"),
            F.ceil("x").cast("bigint").alias("ce"),
            F.abs("x").alias("ab"),
            F.signum("x").cast("int").alias("sg"),
            F.sqrt(F.abs("x")).alias("sq"),  # IEEE correctly-rounded → exact
        ],
        """SELECT i, CAST(FLOOR(x) AS BIGINT), CAST(CEIL(x) AS BIGINT),
                  ABS(x), CAST(sign(x) AS INT), sqrt(ABS(x)) FROM t""",
    )


@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_int_scalar_parity(spark, xs):
    rows = [(i, x) for i, x in enumerate(xs)]
    _compare(
        spark,
        rows,
        "i int, x bigint",
        [
            F.pmod("x", F.lit(7)).cast("bigint").alias("pm"),
            (F.col("x") % 7).cast("bigint").alias("md"),
            F.greatest(F.col("x"), F.lit(0).cast("bigint")).alias("gr"),
            F.col("x").cast("string").alias("s"),
            F.col("x").cast("string").cast("bigint").alias("rt"),
        ],
        """SELECT i, ((x % 7) + 7) % 7, x % 7,
                  greatest(x, 0), CAST(x AS VARCHAR),
                  CAST(CAST(x AS VARCHAR) AS BIGINT) FROM t""",
    )


_ASCII = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 _-"


@given(
    st.lists(
        st.text(alphabet=_ASCII, min_size=0, max_size=30),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_string_scalar_parity(spark, xs):
    rows = [(i, x) for i, x in enumerate(xs)]
    _compare(
        spark,
        rows,
        "i int, x string",
        [
            F.upper("x").alias("up"),
            F.lower("x").alias("lo"),
            F.length("x").cast("bigint").alias("ln"),
            F.substring("x", 2, 3).alias("sub"),
            F.concat(F.col("x"), F.lit("|"), F.col("x")).alias("cc"),
            F.trim("x").alias("tr"),
            F.reverse("x").alias("rv"),
        ],
        """SELECT i, upper(x), lower(x), CAST(length(x) AS BIGINT),
                  substring(x, 2, 3), concat(x, '|', x), trim(x),
                  reverse(x) FROM t""",
    )


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**31),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_epoch_timestamp_parity(spark, xs):
    """unix-secs → timestamp and calendar-field extraction — the
    reference's storage format for block timestamps."""
    rows = [(i, x) for i, x in enumerate(xs)]
    ts = F.timestamp_seconds("x").cast("timestamp_ntz")
    _compare(
        spark,
        rows,
        "i int, x bigint",
        [
            ts.alias("ts"),
            F.year(ts).alias("y"),
            F.dayofweek(ts).alias("dw"),
            F.to_date(ts).alias("d"),
        ],
        """SELECT i, make_timestamp(x * 1000000),
                  CAST(date_part('year', make_timestamp(x * 1000000)) AS INT),
                  CAST(date_part('dow', make_timestamp(x * 1000000)) + 1 AS INT),
                  CAST(make_timestamp(x * 1000000) AS DATE) FROM t""",
    )


@given(
    st.lists(
        st.dates(
            min_value=datetime.date(1970, 1, 1),
            max_value=datetime.date(2100, 1, 1),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_date_arith_parity(spark, xs):
    rows = [(i, x) for i, x in enumerate(xs)]
    _compare(
        spark,
        rows,
        "i int, x date",
        [
            F.date_add("x", 31).alias("plus"),
            F.last_day("x").alias("eom"),
            F.datediff("x", F.lit("2000-01-01").cast("date")).alias("dd"),
            F.date_trunc("month", "x").cast("date").alias("mstart"),
        ],
        """SELECT i, CAST(x + INTERVAL 31 DAY AS DATE), last_day(x),
                  CAST(date_diff('day', DATE '2000-01-01', x) AS INT),
                  CAST(date_trunc('month', x) AS DATE) FROM t""",
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_zvalue_bijective_and_cross_engine(spark, pairs):
    """The Morton interleave must be invertible (no two (x,y) collide)
    and bit-identical between the Spark column expression and the
    generated DuckDB SQL."""
    from graphsense_datafeed_spark.sources.scans import _zvalue_sql, zvalue_col

    rows = [(i, x, y) for i, (x, y) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i int, x long, y long")
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zvalue_col(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(
        con.sql(f"SELECT i, {_zvalue_sql('x', 'y')} FROM t").fetchall()
    )
    con.close()
    assert got == want
    # bijective: distinct pairs → distinct z
    distinct_pairs = {(x, y) for _, x, y in rows}
    assert len({got[i] for i, x, y in rows}) == len(distinct_pairs)


@given(
    st.lists(
        st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=15),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_doubled_unit_median_parity(spark, arrs):
    """The lo+hi sorted-midpoint kernel (win_moving_median /
    win_hampel_filter's doubled-unit median) must agree cross-engine
    for ANY integer array — odd, even, duplicated, negative."""
    rows = [(i, a) for i, a in enumerate(arrs)]
    n = F.size("a")
    srt = F.array_sort("a")
    lo = F.element_at(srt, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(srt, (n - F.floor((n - 1) / 2)).cast("int"))
    _compare(
        spark,
        rows,
        "i int, a array<long>",
        [(lo + hi).alias("med2")],
        """
        SELECT i,
               list_sort(a)[CAST((len(a) + 1) // 2 AS INT)]
               + list_sort(a)[CAST(len(a) - (len(a) - 1) // 2 AS INT)]
                   AS med2
        FROM t
        """,
    )


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1), min_size=1, max_size=24),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_seedless_bit_fold_parity(spark, arrs):
    """acc·2 + x folded WITHOUT an explicit seed must equal the
    seed-0 fold on both engines (multimodal_phash_dedup's block-key
    kernel relies on DuckDB's first-element seeding ≡ Spark's 0
    seed for this operator)."""
    rows = [(i, a) for i, a in enumerate(arrs)]
    spark_fold = F.aggregate(
        "a", F.lit(0).cast("bigint"), lambda acc, x: acc * 2 + x
    ).alias("key")
    _compare(
        spark,
        rows,
        "i int, a array<long>",
        [spark_fold],
        "SELECT i, list_reduce(a, (acc, x) -> acc * 2 + x) AS key FROM t",
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**52),
            st.integers(min_value=0, max_value=10**11),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_sortable_string_encode_roundtrip_parity(spark, pairs):
    """The fixed-width zero-padded (epoch_us‖id) string encoding
    (events_attribution / join_asof_nearest) must decode back to its
    inputs identically on both engines, and its string order must
    equal the numeric order."""
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    key = F.concat(
        F.lpad(F.col("a").cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(F.col("b").cast("string"), 12, "0"),
    )
    _compare(
        spark,
        rows,
        "i int, a long, b long",
        [
            F.substring(key, 1, 20).cast("bigint").alias("back_a"),
            F.substring(key, 22, 12).cast("bigint").alias("back_b"),
        ],
        """
        SELECT i,
               CAST(substr(lpad(CAST(a AS VARCHAR), 20, '0') || '|'
                           || lpad(CAST(b AS VARCHAR), 12, '0'),
                           1, 20) AS BIGINT) AS back_a,
               CAST(substr(lpad(CAST(a AS VARCHAR), 20, '0') || '|'
                           || lpad(CAST(b AS VARCHAR), 12, '0'),
                           22, 12) AS BIGINT) AS back_b
        FROM t
        """,
    )
    # string order ≡ numeric order (the property MAX-over-window uses)
    encoded = sorted(
        (f"{a:020d}|{b:012d}", (a, b)) for a, b in pairs
    )
    assert [v for _, v in encoded] == sorted((a, b) for a, b in pairs)


# ---------- round-7 decomposition kernels (pure-formula properties:
# these mirror arithmetic BOTH engines run, on inputs the fixture may
# never exercise — N < buckets, all-tied ranks, degenerate bands) ----


def _ntile_direct(n: int, k: int) -> list:
    """NTILE(k) reference: first (n % k) buckets get (n // k) + 1."""
    base, rem = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (base + 1 if b <= rem else base))
    return out


@given(st.integers(min_value=1, max_value=2000))
@settings(max_examples=60, deadline=None)
def test_equidepth_bucket_formula_equals_ntile(n):
    """The histogram_equidepth arithmetic — base = N÷8, rem = N mod 8,
    head = rem·(base+1); bucket = ceil-div against base+1 in the head,
    shifted ceil-div against base after — must equal NTILE(8) for
    EVERY rn, including N < 8 and exact-boundary N."""
    k = 8
    direct = _ntile_direct(n, k)
    base, rem = divmod(n, k)
    head = rem * (base + 1)
    for rn in range(1, n + 1):
        if rn <= head:
            b = (rn + base) // (base + 1)
        else:
            b = rem + (rn - head + base - 1) // base
        assert b == direct[rn - 1], (n, rn)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=40, deadline=None)
def test_spearman_doubled_rank_moments_match_reference(pairs):
    """The doubled-tie-rank Mann-Whitney/Spearman machinery: doubled
    average ranks computed the atom-table way (2·prev + c + 1 per
    atom) must equal 2× the classic average rank per element."""
    xs = [p[0] for p in pairs]
    # atom-table form
    from collections import Counter

    cnt = Counter(xs)
    atoms = sorted(cnt)
    prev, rank2 = 0, {}
    for a in atoms:
        rank2[a] = 2 * prev + cnt[a] + 1
        prev += cnt[a]
    # classic average ranks
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    classic = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2  # average of positions i+1..j
        for t in range(i, j):
            classic[order[t]] = avg
        i = j
    for i, x in enumerate(xs):
        assert rank2[x] == int(2 * classic[i])


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
             max_size=9)
)
@settings(max_examples=40, deadline=None)
def test_lower_median_rank_pick_never_empty(values):
    """The (k+1)//2 integer lower-median pick (median-of-means,
    Theil–Sen): for every k ≥ 1 the picked rank exists and is the
    classic lower median."""
    k = len(values)
    pick = (k + 1) // 2
    assert 1 <= pick <= k
    assert sorted(values)[pick - 1] == sorted(values)[(k - 1) // 2]


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=2,
             max_size=8),
    st.lists(st.integers(min_value=0, max_value=30), min_size=2,
             max_size=8),
)
@settings(max_examples=40, deadline=None)
def test_t_closeness_integer_emd_matches_float_reference(g, q):
    """The common-denominator integer EMD (anon_t_closeness):
    Σ|cum(gc·N − c·gn)| / ((m−1)·gn·N) must equal the float EMD over
    normalized distributions to 1e-9."""
    m = min(len(g), len(q))
    g, q = g[:m], q[:m]
    gn, N = sum(g), sum(q)
    if gn == 0 or N == 0 or m < 2:
        return
    # integer form
    cum, acc = 0, 0
    for i in range(m):
        cum += g[i] * N - q[i] * gn
        acc += abs(cum)
    integer_emd = acc / ((m - 1) * gn * N)
    # float reference
    cumf, accf = 0.0, 0.0
    for i in range(m):
        cumf += g[i] / gn - q[i] / N
        accf += abs(cumf)
    float_emd = accf / (m - 1)
    assert abs(integer_emd - float_emd) < 1e-9


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_katz_message_passing_equals_walk_enumeration(raw_edges):
    """graph_katz_bounded's message-passing recurrence
    walks_{k+1}(a) = Σ_{b∈N(a)} walks_k(b) must equal brute-force
    walk ENUMERATION on arbitrary small graphs (walks revisit nodes,
    so path intuition does not apply — the recurrence is the spec)."""
    edges = {(a, b) for a, b in raw_edges if a != b}
    sym = edges | {(b, a) for a, b in edges}
    if not sym:
        return
    nodes = {a for a, _ in sym} | {b for _, b in sym}
    nbrs = {n: [b for a, b in sym if a == n] for n in nodes}
    # message passing
    w1 = {n: len(nbrs[n]) for n in nodes}
    w2 = {n: sum(w1[b] for b in nbrs[n]) for n in nodes}
    w3 = {n: sum(w2[b] for b in nbrs[n]) for n in nodes}
    # brute-force enumeration of length-k walks from each node
    for n in nodes:
        walks = [[n]]
        for k, expect in ((1, w1), (2, w2), (3, w3)):
            walks = [w + [b] for w in walks for b in nbrs[w[-1]]]
            assert len(walks) == expect[n], (n, k)
