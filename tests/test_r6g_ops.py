"""Round-6 wave-g operators: sweep-line max concurrency, DiD estimator,
embedding health gate, tokenizer fertility."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from etl_java_spark.operators.timeseries import max_concurrency
from etl_java_spark.operators.experiments import ab_assign, diff_in_diff
from etl_java_spark.operators.dq import embedding_health
from etl_java_spark.operators.corpus import tokenizer_fertility


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, lo int, hi int")


def test_max_concurrency_basic_peak_and_earliest(spark):
    # [0,10) [5,15) [10,20): at t=10 the first closes BEFORE the third
    # opens (half-open), so concurrency never exceeds 2; first reached
    # at t=5.
    out = max_concurrency(
        _iv(spark, [("k", 0, 10), ("k", 5, 15), ("k", 10, 20)]),
        "k", "lo", "hi",
    ).collect()[0]
    assert out["n_intervals"] == 3
    assert out["peak_concurrency"] == 2
    assert out["peak_at"] == 5


def test_max_concurrency_half_open_touching(spark):
    # back-to-back intervals never overlap
    out = max_concurrency(
        _iv(spark, [("k", 0, 5), ("k", 5, 10), ("k", 10, 15)]),
        "k", "lo", "hi",
    ).collect()[0]
    assert out["peak_concurrency"] == 1
    assert out["peak_at"] == 0


def test_max_concurrency_earliest_of_equal_peaks(spark):
    # two separate pile-ups of 2 -> report the FIRST one's instant
    out = max_concurrency(
        _iv(
            spark,
            [("k", 0, 10), ("k", 1, 10), ("k", 20, 30), ("k", 21, 31)],
        ),
        "k", "lo", "hi",
    ).collect()[0]
    assert out["peak_concurrency"] == 2
    assert out["peak_at"] == 1


def test_max_concurrency_per_key_isolation(spark):
    rows = [("a", 0, 10), ("a", 2, 12), ("a", 4, 14), ("b", 0, 1)]
    out = {r["k"]: r for r in
           max_concurrency(_iv(spark, rows), "k", "lo", "hi").collect()}
    assert out["a"]["peak_concurrency"] == 3
    assert out["b"]["peak_concurrency"] == 1
    assert out["b"]["n_intervals"] == 1


def test_diff_in_diff_constant_cells(spark):
    # constant metric within each (group, period) cell -> the DiD
    # contrast is exact regardless of how the hash splits the units:
    # treat post-shift 10.00, control post-shift 2.00 -> did 8.00 (800
    # cents).
    units = list(range(1, 41))
    gmap = {
        r["u"]: r["g"]
        for r in spark.createDataFrame([(u,) for u in units], "u long")
        .select("u", ab_assign("u").alias("g"))
        .collect()
    }
    assert set(gmap.values()) == {0, 1}  # both arms populated
    pre = dt.datetime(2024, 1, 10)
    post = dt.datetime(2024, 1, 20)
    rows = []
    for u in units:
        rows.append((u, pre, 10.0))
        rows.append((u, post, 20.0 if gmap[u] == 1 else 12.0))
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    out = diff_in_diff(df, "u", "ts", "v", "2024-01-16 00:00:00").collect()[0]
    assert out["n_c_pre"] == out["n_c_post"]
    assert out["n_t_pre"] == out["n_t_post"]
    assert out["mean_c_pre"] == 1000.0 and out["mean_t_pre"] == 1000.0
    assert out["mean_c_post"] == 1200.0 and out["mean_t_post"] == 2000.0
    assert out["did"] == 800.0


def test_embedding_health_flags_every_defect(spark):
    rows = [
        (1, [3.0, 4.0]),          # healthy, norm 5
        (2, None),                # null vector
        (3, [0.0, 0.0]),          # zero vector (norm 0, still finite)
        (4, [float("nan"), 1.0]),  # non-finite
        (5, [1.0, 2.0, 2.0]),     # dimension drift, norm 3
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = embedding_health(df, "embedding", expected_dim=2).collect()[0]
    assert out["n_vecs"] == 5
    assert out["n_null_vec"] == 1
    assert out["n_dims_distinct"] == 2 and out["min_dim"] == 2
    assert out["max_dim"] == 3
    assert out["n_nonfinite_vec"] == 1
    assert out["n_zero_vec"] == 1
    assert out["norm_min"] == 0.0 and out["norm_max"] == 5.0
    assert math.isclose(out["norm_avg"], 8.0 / 3.0, rel_tol=1e-9)
    assert out["dim_ok"] is False


def test_embedding_health_clean_corpus(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)], "id long, embedding array<float>"
    )
    out = embedding_health(df, "embedding", expected_dim=2).collect()[0]
    assert out["n_null_vec"] == out["n_zero_vec"] == out["n_nonfinite_vec"] == 0
    assert out["dim_ok"] is True
    assert out["norm_min"] == out["norm_max"] == out["norm_avg"] == 1.0


def test_tokenizer_fertility_hand_counts(spark):
    df = spark.createDataFrame(
        [
            ("en", "ab cd"),   # 5 chars, 5 bytes, 2 words, 2 pretokens
            ("fr", "héé"),  # 3 chars, 5 bytes, 1 word, 1 pretoken
            ("en", ""),        # contributes zeros only
        ],
        "lang string, text string",
    )
    out = {r["lang"]: r for r in
           tokenizer_fertility(df, "lang", "text").collect()}
    en, fr = out["en"], out["fr"]
    assert (en["n_docs"], en["chars"], en["bytes"]) == (2, 5, 5)
    assert (en["words"], en["bpe_tokens"]) == (2, 2)
    assert en["chars_per_token"] == 2.5
    assert en["bytes_per_char"] == 1.0 and en["tokens_per_word"] == 1.0
    assert (fr["chars"], fr["bytes"], fr["words"], fr["bpe_tokens"]) == (
        3, 5, 1, 1,
    )
    assert fr["bytes_per_char"] == 5.0 / 3.0


def test_tokenizer_fertility_zero_guards(spark):
    # a group with only empty text -> NULL ratios, no division error
    df = spark.createDataFrame(
        [("zz", ""), ("zz", "")], "lang string, text string"
    )
    out = tokenizer_fertility(df, "lang", "text").collect()[0]
    assert out["chars"] == 0 and out["bpe_tokens"] == 0
    assert out["chars_per_token"] is None
    assert out["bytes_per_char"] is None
    assert out["tokens_per_word"] is None


from etl_java_spark.operators.timeseries import (  # noqa: E402
    interpolate_linear,
    max_concurrency as _mc,  # noqa: F401  (wave-1 import kept above)
    rolling_median,
    theil_sen_slope,
)


def test_theil_sen_outlier_immunity(spark):
    # y = 2x with one wild outlier -> slope still exactly 2
    pts = spark.createDataFrame(
        [("k", x, 2 * x if x != 5 else 500) for x in range(10)],
        "k string, x int, y long",
    )
    out = theil_sen_slope(pts, "k", "x", "y").collect()[0]
    assert out["n_points"] == 10 and out["n_pairs"] == 45
    assert out["slope"] == 2.0


def test_theil_sen_even_pair_median(spark):
    # 4 points -> 6 pairwise slopes, even count -> mean of the two
    # middles: sorted slopes [1,1,1,100,149.5,299] -> (1+100)/2
    pts = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 1), ("k", 2, 2), ("k", 3, 300)],
        "k string, x int, y long",
    )
    out = theil_sen_slope(pts, "k", "x", "y").collect()[0]
    assert out["n_pairs"] == 6
    assert out["slope"] == (1.0 + 100.0) / 2.0


def test_theil_sen_single_point_key(spark):
    pts = spark.createDataFrame(
        [("a", 0, 0), ("a", 1, 5), ("b", 3, 7)], "k string, x int, y long"
    )
    out = {r["k"]: r for r in theil_sen_slope(pts, "k", "x", "y").collect()}
    assert out["a"]["slope"] == 5.0
    assert out["b"]["n_pairs"] == 0 and out["b"]["slope"] is None


def test_rolling_median_odd_even_and_warmup(spark):
    rows = [("k", i, v) for i, v in enumerate([1, 100, 3, 5, 2, 9, 7])]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    out = {
        r["t"]: r
        for r in rolling_median(df, "k", "t", "v", window_rows=3).collect()
    }
    assert out[0]["rolling_median"] == 1.0          # warm-up n=1
    assert out[1]["rolling_median"] == 50.5         # n=2 -> (1+100)/2
    assert out[2]["rolling_median"] == 3.0          # {1,100,3}
    assert out[4]["rolling_median"] == 3.0          # {3,5,2}
    assert out[6]["rolling_median"] == 7.0          # {2,9,7}
    assert out[6]["n_in_window"] == 3


def test_interpolate_linear_interior_and_edges(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 1), 10.0),
            ("k", dt.datetime(2024, 1, 1, 4), 40.0),
        ],
        "k string, ts timestamp, v double",
    )
    agg = F.round(F.sum("v")).cast("long")
    out = {
        r["bucket"].hour: r
        for r in interpolate_linear(ev, "k", "ts", agg, "hour").collect()
    }
    assert out[1]["filled"] == 10.0 and out[1]["is_gap"] is False
    assert out[2]["filled"] == 20.0 and out[2]["is_gap"] is True
    assert out[3]["filled"] == 30.0
    assert out[4]["filled"] == 40.0


def test_interpolate_linear_uneven_gap_fraction(spark):
    import datetime as dt

    # observations 4 hours apart, value step 10 -> quarter steps
    ev = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 0), 0.0),
            ("k", dt.datetime(2024, 1, 1, 4), 10.0),
        ],
        "k string, ts timestamp, v double",
    )
    agg = F.round(F.sum("v")).cast("long")
    got = [
        r["filled"]
        for r in interpolate_linear(ev, "k", "ts", agg, "hour")
        .orderBy("bucket")
        .collect()
    ]
    assert got == [0.0, 2.5, 5.0, 7.5, 10.0]


def test_xml_roundtrip_escapes_and_types(spark, tmp_path):
    from etl_java_spark.sources.readers import read_xml

    df = spark.createDataFrame(
        [
            (1, 'a<b&c>"d"', 1.5),
            (2, "plain", -0.25),
            (3, "unicode héé", 1e300),
        ],
        "id long, name string, bal double",
    )
    path = str(tmp_path / "xmlrt")
    (
        df.coalesce(1).write.format("xml")
        .option("rootTag", "rows").option("rowTag", "row").save(path)
    )
    back = {r["id"]: r for r in read_xml(spark, path, row_tag="row").collect()}
    assert back[1]["name"] == 'a<b&c>"d"'  # entity escaping roundtrips
    assert back[3]["name"] == "unicode héé"
    assert back[1]["bal"] == 1.5 and back[3]["bal"] == 1e300  # bitwise


def test_parquet_merge_schema_evolution(spark, tmp_path):
    from etl_java_spark.sources.readers import read_parquet_merged

    path = str(tmp_path / "evo")
    old = spark.createDataFrame([(1, 10)], "k long, a long")
    new = spark.createDataFrame([(2, 20)], "k long, b long")
    old.write.parquet(path)
    new.write.mode("append").parquet(path)
    got = {r["k"]: r for r in read_parquet_merged(spark, path).collect()}
    assert set(read_parquet_merged(spark, path).columns) == {"k", "a", "b"}
    assert got[1]["a"] == 10 and got[1]["b"] is None  # old gen: b NULL
    assert got[2]["b"] == 20 and got[2]["a"] is None  # new gen: a NULL
