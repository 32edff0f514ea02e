"""Label-agreement audit (operators/agreement.label_agreement):
python twin, perfect/chance/degenerate kappa contracts, honest-NULL
precision/recall, NULL-label exclusion."""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.agreement import label_agreement


def _frame(spark, pairs):
    return spark.createDataFrame(pairs, "ref string, pred string")


def _py_agreement(pairs):
    pairs = [(r, p) for r, p in pairs if r is not None and p is not None]
    n = len(pairs)
    ref_m = Counter(r for r, _ in pairs)
    pred_m = Counter(p for _, p in pairs)
    diag = Counter(r for r, p in pairs if r == p)
    labels = sorted(set(ref_m) | set(pred_m))
    pesum = 0.0
    for lbl in labels:  # label-sorted fold, matching the operator
        pesum += float(ref_m.get(lbl, 0)) * float(pred_m.get(lbl, 0))
    po = sum(diag.values()) / n
    pe = pesum / (n * n)
    kappa = None if pe == 1.0 else round((po - pe) / (1.0 - pe), 6)
    out = {}
    for lbl in labels:
        nr, np_, nc = ref_m.get(lbl, 0), pred_m.get(lbl, 0), diag.get(lbl, 0)
        prec = round(nc / np_, 6) if np_ > 0 else None
        rec = round(nc / nr, 6) if nr > 0 else None
        if np_ > 0 and nr > 0:
            f1 = (
                round(2 * (nc / np_) * (nc / nr) / (nc / np_ + nc / nr), 6)
                if nc > 0
                else 0.0
            )
        else:
            f1 = None
        out[lbl] = (nr, np_, nc, prec, rec, f1, round(po, 6), kappa)
    return out


def test_agreement_matches_python_twin(spark):
    rng = random.Random(20260820)
    classes = ["a", "b", "c", "d"]
    pairs = [
        (rng.choice(classes), rng.choice(classes)) for _ in range(500)
    ]
    got = {
        r.label: (
            r.n_ref, r.n_pred, r.n_correct, r.precision, r.recall, r.f1,
            r.accuracy, r.kappa,
        )
        for r in label_agreement(_frame(spark, pairs)).collect()
    }
    assert got == _py_agreement(pairs)


def test_perfect_agreement_kappa_one(spark):
    pairs = [("a", "a")] * 5 + [("b", "b")] * 7
    rows = {r.label: r for r in label_agreement(_frame(spark, pairs)).collect()}
    assert rows["a"].kappa == 1.0 and rows["a"].accuracy == 1.0
    assert rows["a"].precision == rows["a"].recall == rows["a"].f1 == 1.0


def test_constant_raters_kappa_null(spark):
    """Both raters constant on the same class: pe == 1, kappa
    undefined — the honest-NULL contract."""
    rows = label_agreement(_frame(spark, [("x", "x")] * 9)).collect()
    assert len(rows) == 1
    assert rows[0].kappa is None and rows[0].accuracy == 1.0


def test_never_predicted_and_ref_absent_null_contracts(spark):
    # 'b' never predicted -> precision NULL; 'c' never in ref ->
    # recall NULL; both get f1 NULL
    pairs = [("a", "a"), ("b", "a"), ("b", "c")]
    rows = {r.label: r for r in label_agreement(_frame(spark, pairs)).collect()}
    assert rows["b"].precision is None and rows["b"].recall == 0.0
    assert rows["c"].recall is None and rows["c"].precision == 0.0
    assert rows["b"].f1 is None and rows["c"].f1 is None


def test_null_labels_excluded(spark):
    pairs = [("a", "a"), (None, "a"), ("a", None), ("a", "a")]
    rows = {r.label: r for r in label_agreement(_frame(spark, pairs)).collect()}
    assert set(rows) == {"a"}
    assert rows["a"].n_ref == 2 and rows["a"].n_pred == 2
    assert rows["a"].kappa is None  # single shared class -> pe == 1


def test_binary_skew_kappa_matches_closed_form(spark):
    # 80/20 skew with a predictor that always says the majority class
    pairs = [("maj", "maj")] * 80 + [("min", "maj")] * 20
    rows = {r.label: r for r in label_agreement(_frame(spark, pairs)).collect()}
    # po = 0.8; pe = (80*100 + 20*0)/100^2 = 0.8 -> kappa = 0
    assert rows["maj"].accuracy == 0.8
    assert rows["maj"].kappa == 0.0
    assert rows["min"].precision is None  # never predicted
