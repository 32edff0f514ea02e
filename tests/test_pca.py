"""Distributed PCA (operators/pca.py): numpy parity, orthonormality,
variance ordering, whitening, partitioning invariance, NULL handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.pca import fit_pca, pca_project
from mrt_data_integration_spark.sources import load_table


def _np_pca(X, k, center=True):
    mean = X.mean(0) if center else np.zeros(X.shape[1])
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, w[order]


def test_fit_matches_numpy_twin(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    X = np.array(
        [list(map(float, r.embedding)) for r in emb.collect()]
    )
    model = fit_pca(emb, k=6)
    mean, comps, ev = _np_pca(X, 6)
    assert model["n"] == len(X)
    np.testing.assert_allclose(model["mean"], mean, atol=1e-10)
    np.testing.assert_allclose(model["components"], comps, atol=1e-8)
    np.testing.assert_allclose(model["explained_var"], ev, atol=1e-10)


def test_components_orthonormal_and_variance_ordered(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    model = fit_pca(emb, k=8)
    W = np.asarray(model["components"])
    np.testing.assert_allclose(W @ W.T, np.eye(8), atol=1e-10)
    ev = model["explained_var"]
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    assert all(v >= -1e-10 for v in ev)
    # projected coordinate variances == the eigenvalues
    out = pca_project(emb, model).select("pca").collect()
    Y = np.array([r.pca for r in out])
    np.testing.assert_allclose(Y.var(0), ev, rtol=1e-8, atol=1e-12)


def test_whiten_gives_unit_variance(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    model = fit_pca(emb, k=4)
    Y = np.array(
        [
            r.pca
            for r in pca_project(emb, model, whiten=True)
            .select("pca")
            .collect()
        ]
    )
    np.testing.assert_allclose(Y.var(0), np.ones(4), rtol=1e-6)


def test_partitioning_invariance(spark, sf_smoke):
    """Partial-moment summation order differs across layouts; the
    fitted basis must agree to float-noise tolerance and the model is
    deterministic for a FIXED layout."""
    emb = load_table(spark, sf_smoke, "embeddings")
    m1 = fit_pca(emb, k=5)
    m2 = fit_pca(emb.repartition(7), k=5)
    np.testing.assert_allclose(
        m1["components"], m2["components"], atol=1e-8
    )
    m3 = fit_pca(emb, k=5)
    assert m1 == m3  # identical layout → bit-identical model


def test_null_vectors_excluded_from_fit_and_null_out_on_project(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, None), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    model = fit_pca(df, k=2)
    assert model["n"] == 3
    out = {
        r.vec_id: r.pca for r in pca_project(df, model).collect()
    }
    assert out[2] is None
    assert out[0] is not None and len(out[0]) == 2


def test_validates_inputs(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds the vector dimension"):
        fit_pca(df, k=5)
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(df, k=0)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="at least one"):
        fit_pca(empty, k=1)


def test_ragged_corpus_fails_with_named_contract(spark):
    """Mixed vector dims pass the 1-row driver probe; the per-batch
    check must raise the NAMED contract instead of an opaque numpy
    shape error mid-task."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="fixed-dimension vectors"):
        fit_pca(df, k=1)
