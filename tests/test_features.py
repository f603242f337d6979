"""Out-of-fold target encoding (operators/features.py): leakage property,
m-estimate smoothing, prior fallback — against a Python reference using
the same md5-portable fold hash."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from agol_pandas_spark.operators.features import fold_of, target_encode_oof


def py_fold(key, folds, salt="fold"):
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16) % folds


def py_encode(rows, folds, m):
    """rows: (cat, key, cents). Returns {(cat, fold): (n_rows, enc_milli)}."""
    cf_n, cf_s = defaultdict(int), defaultdict(int)
    for cat, key, cents in rows:
        f = py_fold(key, folds)
        cf_n[(cat, f)] += 1
        cf_s[(cat, f)] += cents
    ct_n, ct_s = defaultdict(int), defaultdict(int)
    gf_n, gf_s = defaultdict(int), defaultdict(int)
    n_all = s_all = 0
    for (cat, f), n in cf_n.items():
        ct_n[cat] += n
        ct_s[cat] += cf_s[(cat, f)]
        gf_n[f] += n
        gf_s[f] += cf_s[(cat, f)]
        n_all += n
        s_all += cf_s[(cat, f)]
    out = {}
    for (cat, f), n in cf_n.items():
        prior = None
        if n_all - gf_n[f] > 0:
            prior = (s_all - gf_s[f]) * 1000 // (n_all - gf_n[f])
        n_excl = ct_n[cat] - n
        s_excl = ct_s[cat] - cf_s[(cat, f)]
        if m > 0:
            enc = (s_excl * 1000 + m * prior) // (n_excl + m)
        elif n_excl > 0:
            enc = s_excl * 1000 // n_excl
        else:
            enc = prior
        out[(cat, f)] = (n, enc)
    return out


def run(spark, rows, folds=3, m=0):
    df = spark.createDataFrame(rows, "cat string, key long, cents long")
    out = target_encode_oof(
        df, cat_col="cat", target_cents_col="cents", key_col="key",
        folds=folds, smoothing=m,
    )
    return {(r["cat"], r["fold"]): (r["n_rows"], r["enc_milli"]) for r in out.collect()}


class TestTargetEncodeOof:
    def test_matches_python_reference_unsmoothed(self, spark):
        rows = [("a", k, 100 * (k + 1)) for k in range(30)] + [
            ("b", k, 50 * k) for k in range(30, 60)
        ]
        assert run(spark, rows, folds=3, m=0) == py_encode(rows, 3, 0)

    def test_matches_python_reference_smoothed(self, spark):
        rows = [("a", k, 100 * (k + 1)) for k in range(30)] + [
            ("b", k, 50 * k) for k in range(30, 60)
        ]
        assert run(spark, rows, folds=3, m=10) == py_encode(rows, 3, 10)

    def test_leakage_free(self, spark):
        """Changing targets INSIDE fold f must not change fold f's encoding."""
        rows = [("a", k, 100) for k in range(40)]
        f0_keys = [k for k in range(40) if py_fold(k, 3) == 0]
        assert f0_keys, "seedless fixture must hit fold 0"
        poisoned = [
            ("a", k, 10_000_000 if k in f0_keys else 100) for k in range(40)
        ]
        base = run(spark, rows, folds=3, m=0)
        pois = run(spark, poisoned, folds=3, m=0)
        assert pois[("a", 0)][1] == base[("a", 0)][1]  # unchanged
        assert pois[("a", 1)][1] != base[("a", 1)][1]  # others see the poison

    def test_single_fold_category_falls_back_to_prior(self, spark):
        rows = [("common", k, 200) for k in range(40)]
        rare_key = 1000
        rows.append(("rare", rare_key, 999_999))
        got = run(spark, rows, folds=3, m=0)
        rare_fold = py_fold(rare_key, 3)
        ref = py_encode(rows, 3, 0)
        assert got[("rare", rare_fold)] == ref[("rare", rare_fold)]
        # the prior excludes the rare row's own fold entirely
        assert got[("rare", rare_fold)][1] == 200 * 1000

    def test_fold_of_is_stable_and_bounded(self, spark):
        df = spark.createDataFrame([(k,) for k in range(100)], "key long")
        vals = [r[0] for r in df.select(fold_of("key", 7)).collect()]
        assert set(vals) <= set(range(7))
        assert vals == [py_fold(k, 7) for k in range(100)]

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1, 1)], "cat string, key long, cents long")
        with pytest.raises(ValueError, match="folds"):
            target_encode_oof(df, "cat", "cents", "key", folds=1)
        with pytest.raises(ValueError, match="smoothing"):
            target_encode_oof(df, "cat", "cents", "key", smoothing=-1)


class TestQuantileNormalize:
    def _ref(self, rows):
        vals = sorted(v for _, _, v in rows)
        n = len(vals)
        groups = {}
        for g, i, v in rows:
            groups.setdefault(g, []).append((v, i))
        ref = {}
        for g, lst in groups.items():
            lst.sort()
            ng = len(lst)
            for r0, (v, i) in enumerate(lst):
                p = max(1, -(-r0 * n // (ng - 1))) if ng > 1 else 1
                ref[i] = vals[p - 1]
        return ref

    @pytest.mark.parametrize("n_parts", [1, 5])
    def test_matches_python_reference(self, spark, n_parts):
        import random

        from agol_pandas_spark.operators.features import quantile_normalize

        rng = random.Random(7)
        rows = [
            (f"g{rng.randrange(4)}", i, rng.randrange(1, 50)) for i in range(150)
        ]
        rows.append(("solo", 999, 17))  # singleton group -> pooled min
        df = spark.createDataFrame(
            rows, "grp string, id long, v long"
        ).repartition(n_parts)
        got = {
            r["id"]: r["norm_value"]
            for r in quantile_normalize(df, "grp", "v", "id").collect()
        }
        assert got == self._ref(rows)
        assert got[999] == min(v for _, _, v in rows)

    def test_every_group_gets_pooled_extremes(self, spark):
        """Rank-1 maps to the pooled min and rank-n_g to the pooled max in
        every multi-row group — the defining property of the transform."""
        from agol_pandas_spark.operators.features import quantile_normalize

        rows = [("a", 1, 100), ("a", 2, 300), ("b", 3, 1), ("b", 4, 9999)]
        df = spark.createDataFrame(rows, "grp string, id long, v long")
        got = {
            r["id"]: r["norm_value"]
            for r in quantile_normalize(df, "grp", "v", "id").collect()
        }
        assert got[1] == 1 and got[3] == 1          # group minima -> pooled min
        assert got[2] == 9999 and got[4] == 9999    # group maxima -> pooled max

    def test_null_inputs_raise(self, spark):
        from agol_pandas_spark.operators.features import quantile_normalize

        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, None), ("b", 3, 5)],
            "grp string, id long, v long",
        )
        with pytest.raises(Exception, match="NULL"):
            quantile_normalize(df, "grp", "v", "id").collect()


def test_hashing_trick_matches_python_reference(spark):
    """Bucket ids, counts, and the serialized vector must equal a
    Python md5 recompute of the same tokens."""
    import hashlib
    from collections import Counter

    from agol_pandas_spark.operators.features import hashing_trick_features

    rows = [
        (1, "the quick brown fox the quick"),
        (2, "  spaced   out   tokens "),
        (3, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nnz"], r["vec"])
        for r in hashing_trick_features(df, "doc_id", "text", n_buckets=64).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        cnt = Counter(bucket(t) for t in toks)
        vec = " ".join(f"{b}:{c}" for b, c in sorted(cnt.items()))
        assert got[doc_id] == (len(toks), len(cnt), vec), doc_id


def test_isotonic_fit_matches_sklearn_style_pava(spark):
    """The minimax identity must equal a direct PAVA reference:
    monotone output, pools average violators weighted by denominator,
    already-monotone input is untouched."""
    from agol_pandas_spark.operators.features import isotonic_fit

    def pava(ys, ws):
        # classic pool-adjacent-violators with weights
        blocks = [[y * w, w] for y, w in zip(ys, ws)]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1] + 1e-15:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        # expand block means back to the original points
        fit = []
        bi, used = 0, 0
        for w in ws:
            s, bw = blocks[bi][0], blocks[bi][1]
            fit.append(s / bw)
            used += w
            if used >= bw - 1e-12:
                bi += 1
                used = 0
        return fit

    cases = {
        "violates": ([3, 1, 2, 6, 5], [1, 2, 1, 1, 3]),
        "monotone": ([1, 2, 3, 4, 5], [1, 1, 1, 1, 1]),
        "flat": ([2, 2, 2], [5, 1, 5]),
    }
    rows = []
    for g, (nums, dens) in cases.items():
        for x, (n, d) in enumerate(zip(nums, dens)):
            rows.append((g, x, n * d, d))  # y = n per unit, num = y*den
    df = spark.createDataFrame(rows, "g string, x int, num long, den long")
    got = {
        (r["g"], r["x"]): r["y_fit"]
        for r in isotonic_fit(df, "g", "x", "num", "den").collect()
    }
    for g, (nums, dens) in cases.items():
        ref = pava([float(n) for n in nums], [float(d) for d in dens])
        fit = [got[(g, x)] for x in range(len(nums))]
        assert all(b >= a - 1e-12 for a, b in zip(fit, fit[1:])), g
        assert all(abs(a - b) < 1e-9 for a, b in zip(fit, ref)), (g, fit, ref)
    # already-monotone input is untouched
    assert [got[("monotone", x)] for x in range(5)] == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_misra_gries_candidate_superset(spark):
    """MG candidate union must contain every item with freq > N/k —
    adversarial layout: the heavy item is SPREAD across partitions so
    no single partition sees it as locally dominant-by-a-landslide,
    and a long tail of singletons forces constant evictions."""
    from agol_pandas_spark.operators.sketches import misra_gries_candidates

    k = 10
    # 1000 tail singletons + one item at 150 (> N/k = 115) + one at 80
    rows = [(f"tail{i}",) for i in range(1000)]
    rows += [("heavy",)] * 150 + [("mid",)] * 80
    df = spark.createDataFrame(rows, "cat string").repartition(8)
    n = df.count()
    cands = {r.cat for r in misra_gries_candidates(df, "cat", k).collect()}
    exact = {"heavy"}  # 150 * 10 > 1230
    assert 150 * k > n and 80 * k <= n
    assert exact <= cands, f"superset violated: {exact - cands}"
    # bounded size: at most k candidates per partition
    assert len(cands) <= k * 8


def test_misra_gries_superset_property(spark):
    """Property-based: for random streams and random k, the MG candidate
    union contains EVERY item with global frequency > N/k, under random
    partition counts (layout adversarial by construction)."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from agol_pandas_spark.operators.sketches import misra_gries_candidates

    @settings(max_examples=10, deadline=None)
    @given(
        data=st.lists(st.integers(min_value=0, max_value=30), min_size=20,
                      max_size=400),
        k=st.integers(min_value=2, max_value=12),
        parts=st.integers(min_value=1, max_value=7),
    )
    def prop(data, k, parts):
        df = spark.createDataFrame(
            [(f"i{v}",) for v in data], "cat string"
        ).repartition(parts)
        n = len(data)
        heavy = {f"i{v}" for v, c in Counter(data).items() if c * k > n}
        cands = {
            r.cat for r in misra_gries_candidates(df, "cat", k).collect()
        }
        assert heavy <= cands, (heavy - cands, k, parts, n)

    prop()
